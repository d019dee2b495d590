"""FPN backbone family: pyramid shapes/semantics + LevelMapper parity.

The level-assignment math is compared against the executed reference
LevelMapper (modeling/poolers.py:12-46); FPN output geometry and the
top-block variants are shape/semantics-tested (the modules are dead in
every shipped WSOD config — completeness port, models/fpn.py docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.models.fpn import (FPN, ResNetFPNBackbone,
                                   ResNetFPNP3P7Backbone, assign_levels,
                                   multilevel_roi_pool)


def test_fpn_pyramid_shapes_maxpool():
    feats = tuple(jnp.zeros((1, 64 // s, 80 // s, c))
                  for s, c in ((1, 32), (2, 64), (4, 128), (8, 256)))
    fpn = FPN((32, 64, 128, 256), out_channels=16, top_block="maxpool",
              compute_dtype=jnp.float32)
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert len(outs) == 5                      # P2..P5 + maxpool P6
    for o, (s, _) in zip(outs[:4], ((1, 0), (2, 0), (4, 0), (8, 0))):
        assert o.shape == (1, 64 // s, 80 // s, 16)
    assert outs[4].shape == (1, 4, 5, 16)      # stride-2 maxpool of P5
    p = params["params"]
    assert {"fpn_inner1", "fpn_layer1", "fpn_inner4",
            "fpn_layer4"} <= set(p.keys())


def test_fpn_p3p7_skips_c2_lateral():
    feats = tuple(jnp.zeros((1, 64 // s, 80 // s, c))
                  for s, c in ((1, 32), (2, 64), (4, 128), (8, 256)))
    fpn = FPN((0, 64, 128, 256), out_channels=16, top_block="p6p7",
              compute_dtype=jnp.float32)
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert len(outs) == 5                      # P3..P5 + P6 + P7
    assert outs[0].shape == (1, 32, 40, 16)    # no P2
    assert outs[3].shape == (1, 4, 5, 16)      # P6 = stride-2 conv of C5
    assert outs[4].shape == (1, 2, 3, 16)      # P7
    assert "fpn_inner1" not in params["params"]
    assert {"p6", "p7"} <= set(params["params"].keys())


def test_fpn_topdown_pathway_adds_upsampled():
    # single-channel identity check: with zero laterals at the fine level
    # and a delta at the coarse level, P_fine = 3x3(conv of upsampled top)
    feats = (jnp.zeros((1, 8, 8, 4)), jnp.ones((1, 4, 4, 4)))
    fpn = FPN((4, 4), out_channels=4, top_block=None,
              compute_dtype=jnp.float32)
    params = fpn.init(jax.random.PRNGKey(1), feats)
    p2, p3 = fpn.apply(params, feats)
    assert p2.shape == (1, 8, 8, 4) and p3.shape == (1, 4, 4, 4)
    # the top-down contribution must reach the finest level: zeroing the
    # coarse input changes P2
    p2z, _ = fpn.apply(params, (feats[0], jnp.zeros_like(feats[1])))
    assert float(jnp.abs(p2 - p2z).max()) > 0


@pytest.mark.parametrize("cls,nlv", [(ResNetFPNBackbone, 5),
                                     (ResNetFPNP3P7Backbone, 5)])
def test_resnet_fpn_backbones_run(cls, nlv):
    m = cls(depth="R-18", out_channels=32, compute_dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(m.apply)(params, x)
    assert len(outs) == nlv
    assert all(o.shape[-1] == 32 for o in outs)
    # strides double level to level
    hs = [o.shape[1] for o in outs]
    assert all(hs[i] == -(-hs[i - 1] // 2) for i in range(1, nlv))


def test_assign_levels_matches_reference_levelmapper():
    import wetectron_shims
    wetectron_shims.install()
    import torch
    from wetectron.modeling.poolers import LevelMapper
    from wetectron.structures.bounding_box import BoxList

    rng = np.random.RandomState(0)
    x1y1 = rng.uniform(0, 500, (40, 2)).astype(np.float32)
    wh = np.exp(rng.uniform(np.log(4), np.log(700), (40, 2))).astype(
        np.float32)
    boxes = np.concatenate([x1y1, x1y1 + wh], -1)

    mapper = LevelMapper(2, 5)          # P2..P5 (scales 1/4 .. 1/32)
    bl = BoxList(torch.tensor(boxes), (1333, 800), mode="xyxy")
    ref = mapper([bl]).numpy() + 2      # mapper returns level - k_min
    ours = np.asarray(assign_levels(jnp.asarray(boxes), 2, 5))
    np.testing.assert_array_equal(ours, ref)


def test_multilevel_roi_pool_routes_by_level():
    # fabricate a "pool" that returns the level-constant value so routing
    # is directly observable
    feats = [jnp.full((1, 8, 8, 4), float(i)) for i in range(4)]
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]

    def pool_fn(feat, boxes, mask, scale):
        b, p = boxes.shape[:2]
        return jnp.broadcast_to(feat[0, 0, 0, 0], (b, p, 7, 7, 4))

    boxes = jnp.asarray([[[0, 0, 20, 20],       # tiny -> P2 (level 2)
                          [0, 0, 230, 230],     # ~canonical 224 -> P4
                          [0, 0, 900, 900]]],   # huge -> P5
                        jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(assign_levels(boxes, 2, 5))[0], [2, 4, 5])
    mask = jnp.ones((1, 3), bool)
    out = multilevel_roi_pool(pool_fn, feats, scales, boxes, mask)
    got = np.asarray(out[0, :, 0, 0, 0])
    np.testing.assert_array_equal(got, [0.0, 2.0, 3.0])
