"""Data-parallel mesh: full train step over 8 virtual devices, and the
parity of sharded vs single-device loss (conftest forces 8 CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odwscl_tpu.parallel import make_mesh, shard_batch, replicate
from odwscl_tpu.config import get_default_cfg
from odwscl_tpu.models import WSODDetector
from odwscl_tpu.engine.trainer import create_train_state, make_train_step
import __graft_entry__ as ge


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_runs_and_matches_single_device():
    cfg = get_default_cfg()
    model = WSODDetector(num_classes=6, mlp_dim=64, cap_a=32, cap_b=16,
                         gt_cap=8, pooler_win=8, compute_dtype="float32")
    batch = ge._tiny_batch(b=8, p=16, hw=32, c=6)
    state, tx, _ = create_train_state(model, cfg, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, tx)

    # single device (no sharding constraints)
    _, logs_single = jax.jit(step)(state, batch)

    mesh = make_mesh(("data",))
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    _, logs_sharded = jax.jit(step)(state_r, batch_s)

    # the threshold-free terms are identical math under data sharding;
    # the mined contrastive/pseudo-label terms contain >= comparisons that
    # can flip under f32 reassociation, so only bounded-close is asserted
    np.testing.assert_allclose(float(logs_single["loss_img"]),
                               float(logs_sharded["loss_img"]), rtol=1e-4)
    assert np.isfinite(float(logs_sharded["loss"]))
    np.testing.assert_allclose(float(logs_single["loss"]),
                               float(logs_sharded["loss"]), rtol=0.05)
