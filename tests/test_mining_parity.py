"""Parity: batched jnp mining/od_layer/SupCon vs the numpy transcription of
the reference's per-image loops (tests/reference_impl.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odwscl_tpu.losses import (stage_a, stage_b, assemble_bank, od_layer,
                               supcon_v2_loss)
from reference_impl import ref_mining, ref_supcon_v2, ref_od_layer


def _make_case(seed, b=2, p=16, c1=4, d=8):
    rng = np.random.RandomState(seed)
    x1y1 = rng.uniform(0, 48, (b, p, 2))
    wh = rng.uniform(6, 24, (b, p, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)

    def softmax(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    # WSDDN-like final score (positive, sums to ~1 per class over proposals)
    final = (softmax(rng.randn(b, p, c1 + 1), -1)
             * softmax(rng.randn(b, p, c1 + 1), 1)).astype(np.float64)
    refs = softmax(rng.randn(3, b, p, c1 + 1), -1).astype(np.float64)

    def unitnorm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    z = unitnorm(rng.randn(b, p, d)).astype(np.float64)
    z_drop = unitnorm(rng.randn(b, p, d)).astype(np.float64)
    z_noise = unitnorm(rng.randn(b, p, d)).astype(np.float64)

    labels_fg = np.zeros((b, c1), bool)
    for i in range(b):
        k = rng.randint(1, 3)
        labels_fg[i, rng.choice(c1, size=k, replace=False)] = True
    return boxes, final, refs, z, z_drop, z_noise, labels_fg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mining_matches_reference(seed):
    boxes, final, refs, z, z_drop, z_noise, labels_fg = _make_case(seed)
    b, p, _ = boxes.shape
    c1 = labels_fg.shape[1]
    mask = np.ones((b, p), bool)

    ref = ref_mining([boxes[i] for i in range(b)],
                     [final[i] for i in range(b)],
                     [[refs[r][i] for i in range(b)] for r in range(3)],
                     [z[i] for i in range(b)],
                     [z_drop[i] for i in range(b)],
                     [z_noise[i] for i in range(b)],
                     [set(np.nonzero(labels_fg[i])[0].tolist()) for i in range(b)])

    f32 = jnp.float32
    a = jax.jit(stage_a, static_argnums=(6,))(
        jnp.array(boxes), jnp.array(mask), jnp.array(labels_fg),
        jnp.array(final, f32), jnp.array(refs, f32), 0.5, 256)

    # stage-A membership == reference pgt_index after stage A... compare via
    # reconstructing sets from the A mask
    a_mask = np.asarray(a.a_mask)
    for i in range(b):
        for c in range(c1):
            got = set(np.nonzero(a_mask[i, c])[0].tolist())
            if labels_fg[i, c]:
                # ref pgt_index also contains stage-B additions at the end;
                # recompute stage-A-only sets from ref bank structure:
                pass
    # (full pgt_index checked below through stage B)

    z_drop_slots = jnp.array(z_drop, f32)[jnp.clip(a.slot_b, 0), a.slot_p]
    z_noise_slots = jnp.array(z_noise, f32)[jnp.clip(a.slot_b, 0), a.slot_p]
    sb = jax.jit(stage_b, static_argnums=(10, 11))(
        jnp.array(boxes), jnp.array(mask), jnp.array(labels_fg),
        jnp.array(final, f32), jnp.array(refs, f32), jnp.array(z, f32),
        z_drop_slots, z_noise_slots, a, 0.1, 128, 64)

    assert int(a.overflow) == 0 and int(sb.overflow) == 0

    # pgt_instance sets match
    pi = np.asarray(sb.pgt_instance)
    for i in range(b):
        for r in range(3):
            for c in range(c1):
                got = set(np.nonzero(pi[r, i, c])[0].tolist())
                want = (set(ref["pgt_instance"][i][r][c].tolist())
                        if labels_fg[i, c] else set())
                assert got == want, (seed, i, r, c)

    # SupCon loss value matches (bank multiset equality via the loss itself)
    feats_e, labels_e, hard_e, valid_e = assemble_bank(
        a, sb, jnp.array(z, f32), z_drop_slots, z_noise_slots)
    got_loss = float(supcon_v2_loss(feats_e, labels_e, hard_e, valid_e, 0.2))
    want_loss = ref_supcon_v2(ref["features"], ref["labels"], ref["hardness"], 0.2)
    # f32 (jnp) vs f64 (numpy golden) accumulation noise over the bank matmul
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-3, atol=1e-6)

    # od_layer parity per branch
    for r in range(3):
        src = final if r == 0 else refs[r - 1]
        pl = jax.jit(od_layer, static_argnums=(5, 6))(
            jnp.array(boxes), jnp.array(mask),
            jnp.array(src[..., 1:], f32), jnp.array(labels_fg),
            sb.pgt_instance[r], 0.5, 64)
        for i in range(b):
            want_lab, want_w, want_reg = ref_od_layer(
                boxes[i].astype(np.float64), src[i],
                set(np.nonzero(labels_fg[i])[0].tolist()),
                {c: ref["pgt_instance"][i][r][c]
                 for c in np.nonzero(labels_fg[i])[0]})
            np.testing.assert_array_equal(np.asarray(pl.labels[i]), want_lab,
                                          err_msg=f"labels seed={seed} b={i} r={r}")
            np.testing.assert_allclose(np.asarray(pl.weights[i]), want_w,
                                       rtol=2e-4, atol=1e-6)
            np.testing.assert_allclose(np.asarray(pl.reg_targets[i]), want_reg,
                                       rtol=1e-3, atol=2e-3)
