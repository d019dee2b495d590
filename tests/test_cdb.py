"""Concrete DropBlock: forward shapes, straight-through gumbel, and the
fused adversarial update direction."""

import jax
import jax.numpy as jnp
import numpy as np

from odwscl_tpu.config import get_default_cfg
from odwscl_tpu.models import WSODDetector, ConvConcreteDB, gumbel_softmax
from odwscl_tpu.engine.trainer import create_train_state, make_train_step
import __graft_entry__ as ge


def test_gumbel_softmax_hard_is_onehot_with_soft_grad():
    rng = jax.random.PRNGKey(0)
    logits = jnp.array([[0.5, 1.5, -0.2]])
    hard = gumbel_softmax(rng, logits, tau=0.1, hard=True)
    np.testing.assert_allclose(np.asarray(hard).sum(-1), 1.0, rtol=1e-5)
    assert set(np.unique(np.round(np.asarray(hard), 5))) <= {0.0, 1.0}

    def f(lg):
        return gumbel_softmax(rng, lg, tau=0.5, hard=True).sum() * 0 + \
               (gumbel_softmax(rng, lg, tau=0.5, hard=True) ** 2).sum()

    g = jax.grad(f)(logits)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).sum()) > 0


def test_cdb_module_shapes_and_rescale():
    cdb = ConvConcreteDB(drop_prob=0.3, block_size=3)
    x = jnp.ones((6, 7, 7, 16))
    valid = jnp.array([True] * 4 + [False] * 2)
    v = cdb.init({"params": jax.random.PRNGKey(0),
                  "augment": jax.random.PRNGKey(1)}, x, valid, train=True)
    y = cdb.apply(v, x, valid, train=True,
                  rngs={"augment": jax.random.PRNGKey(2)})
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    # eval mode is the identity
    y_eval = cdb.apply(v, x, valid, train=False)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(x))


def test_concrete_train_step_ascends_cdb():
    cfg = get_default_cfg()
    cfg.DB.METHOD = "concrete"
    model = WSODDetector(num_classes=6, mlp_dim=64, cap_a=32, cap_b=16,
                         gt_cap=8, pooler_win=8, db_method="concrete",
                         compute_dtype="float32")
    batch = ge._tiny_batch(b=2, p=16, hw=32, c=6)
    state, tx, _ = create_train_state(model, cfg, batch,
                                      jax.random.PRNGKey(0))
    assert "cdb" in state.params
    step = jax.jit(make_train_step(model, tx))
    new_state, logs = step(state, batch)
    assert np.isfinite(float(logs["loss"]))
    # cdb params moved (adversarial branch receives non-zero updates)
    before = jax.tree_util.tree_leaves(state.params["cdb"])
    after = jax.tree_util.tree_leaves(new_state.params["cdb"])
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(after, before))
    assert moved > 0
