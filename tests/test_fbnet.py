"""FBNet arch-def interpreter vs the executed reference expansion logic,
IRF block geometry, and the trunk end to end (completeness port —
models/fbnet.py docstring)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.models.fbnet import (MODEL_ARCH, unify_arch_def, get_blocks,
                                     IRFBlock, FBNetTrunk, _divisible,
                                     _parse_op)


def test_unify_arch_def_matches_reference():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.modeling.backbone import fbnet_builder as ref

    raw = MODEL_ARCH["default"]
    ours = unify_arch_def(raw)
    theirs = ref.unify_arch_def(raw)
    assert len(ours["stages"]) == len(theirs["stages"])
    for a, b in zip(ours["stages"], theirs["stages"]):
        assert a["stage_idx"] == b["stage_idx"]
        assert a["block_idx"] == b["block_idx"]
        assert list(a["block"]) == list(b["block"])
        assert a["block_op_type"] == b["block_op_type"][0] \
            if isinstance(b["block_op_type"], list) else b["block_op_type"]
    assert ours["first"] == theirs["first"]

    # stage extraction used by trunk/heads
    sub = get_blocks(ours, stage_indices=[1, 2])
    rsub = ref.get_blocks(theirs, stage_indices=[1, 2])
    assert len(sub["stages"]) == len(rsub["stages"])


def test_divisible_matches_reference():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.modeling.backbone.fbnet_builder import _get_divisible_by

    for num in (7, 8, 15, 16, 23, 100, 96.5):
        for div in (1, 8):
            assert _divisible(num, div, div) == _get_divisible_by(
                num, div, div), (num, div)


def test_parse_op_variants():
    assert _parse_op("skip") == {"kind": "skip"}
    s = _parse_op("ir_k5_e3")
    assert s["kernel"] == 5 and s["expansion"] == 3.0
    s = _parse_op("ir_k3_s4")
    assert s["shuffle"] and s["pw_group"] == 4
    assert _parse_op("shuffle")["pw_group"] == 4


def test_irf_block_geometry_and_residual():
    x = jnp.ones((1, 8, 8, 16))
    blk = IRFBlock(out_depth=16, expansion=6, stride=1,
                   compute_dtype=jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (1, 8, 8, 16)
    # residual active: zeroing pwl's BN scale must give y == x
    p = jax.tree_util.tree_map(lambda a: a, params)
    p["params"]["pwl"]["bn"]["scale"] = jnp.zeros_like(
        p["params"]["pwl"]["bn"]["scale"])
    y_id = blk.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_id), np.asarray(x), atol=1e-6)
    # stride 2 halves, different C_out disables the residual
    blk2 = IRFBlock(out_depth=24, expansion=6, stride=2,
                    compute_dtype=jnp.float32)
    p2 = blk2.init(jax.random.PRNGKey(0), x)
    assert blk2.apply(p2, x).shape == (1, 4, 4, 24)
    # expanded mid width: pw conv kernel is [1, 1, 16, 96]
    assert params["params"]["pw"]["conv"]["kernel"].shape == (1, 1, 16, 96)


def test_fbnet_trunk_runs_default_and_json():
    m = FBNetTrunk(arch="default", compute_dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(params, x)
    # MobileNetV2 backbone stages: strides 2 (first) * 1 * 2 * 2 * 2 = /16
    assert y.shape == (1, 4, 4, 96)

    custom = {
        "block_op_type": [["ir_k3", "skip"], ["ir_k5_e3"]],
        "block_cfg": {"first": [8, 2],
                      "stages": [[[1, 8, 2, 1]], [[3, 16, 1, 2]]],
                      "backbone": [0, 1]},
    }
    m2 = FBNetTrunk(arch_def=json.dumps(custom), compute_dtype=jnp.float32)
    p2 = jax.jit(m2.init)(jax.random.PRNGKey(0), x)
    y2 = jax.jit(m2.apply)(p2, x)
    assert y2.shape == (1, 16, 16, 16)


def test_fbnet_width_scaling():
    m = FBNetTrunk(arch="default", scale_factor=0.5, width_divisor=8,
                   compute_dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(params, x)
    assert y.shape[-1] == _divisible(96 * 0.5, 8, 8)
