"""Spatially-partitioned backbone serving (parallel/sp.py) on a (data, sp)
CPU mesh: exact agreement with the unsharded backbone (halos correct at
every shard boundary) + proof the partitioning is real (the compiled HLO
convolves height-bands and exchanges borders, not a gathered full image).

The reference has no sub-image parallelism (DDP only,
tools/train_net.py:50-55); sp is a TPU-native addition (GSPMD spatial
partitioning of the conv stencil)."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.models.vgg16 import VGGBackbone
from odwscl_tpu.parallel import make_sp_mesh, sp_backbone_apply
from odwscl_tpu.parallel.sp import sp_backbone_lowered_text

pytestmark = pytest.mark.skipif(
    jax.local_device_count() < 8, reason="needs 8 virtual CPU devices")


def _setup(seed=0, b=2, h=128, w=96, s2d=False):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    bb = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                     s2d_stem=s2d)
    params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    return bb, params, x


def test_sp_backbone_matches_unsharded():
    """Halo correctness: band boundaries fall mid-image, so any missing or
    misaligned border exchange corrupts rows there. f32 exactness expected
    (same reduction order per output pixel)."""
    bb, params, x = _setup()
    want = np.asarray(jax.jit(bb.apply)(params, x))
    for n_data, n_sp in ((2, 4), (1, 8), (4, 2)):
        mesh = make_sp_mesh(n_data, n_sp)
        got = np.asarray(sp_backbone_apply(mesh, params, x, bb))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"mesh=({n_data},{n_sp})")


def test_sp_backbone_matches_with_s2d_stem():
    """The shipped TPU.S2D_STEM stem (space-to-depth reshapes) must stay
    correct under height sharding too."""
    bb, params, x = _setup(s2d=True)
    want = np.asarray(jax.jit(bb.apply)(params, x))
    mesh = make_sp_mesh(2, 4)
    got = np.asarray(sp_backbone_apply(mesh, params, x, bb))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sp_backbone_uneven_height_still_correct():
    """H not divisible by 8*sp: GSPMD pads edge shards; results must be
    identical anyway."""
    bb, params, x = _setup(h=104)  # 104 = 8 * 13, not divisible by 8*4
    want = np.asarray(jax.jit(bb.apply)(params, x))
    mesh = make_sp_mesh(2, 4)
    got = np.asarray(sp_backbone_apply(mesh, params, x, bb))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sp_partitioning_is_real():
    """Teeth: the compiled module must (a) exchange halos (collective
    ops present) and (b) run the big convs on height-BANDS — the largest
    conv operand must be ~1/sp of the full-image activation, which rules
    out a secretly-gathered unsharded conv."""
    bb, params, x = _setup(b=1, h=128, w=96)
    mesh = make_sp_mesh(1, 8)
    txt = sp_backbone_lowered_text(mesh, params, x, bb)
    assert ("collective-permute" in txt) or ("all-gather" in txt), (
        "no halo/gather collectives in the sp module")
    # full-image conv1 activation is [1,128,96,64]; a band shard is
    # [1,16(+halo),96,64]. Any f32 conv output shaped with the full 128
    # rows would mean the conv was not spatially partitioned.
    conv_shapes = re.findall(r"f32\[1,(\d+),96,64\]\{[^}]*\} convolution",
                             txt)
    assert conv_shapes, "no stem conv found in HLO"
    assert all(int(s) <= 32 for s in conv_shapes), (
        f"stem conv runs on full-height rows, not bands: {conv_shapes}")


def test_sp_gather_false_keeps_features_sharded():
    bb, params, x = _setup()
    mesh = make_sp_mesh(2, 4)
    feats = sp_backbone_apply(mesh, params, x, bb, gather=False)
    spec = feats.sharding.spec
    assert tuple(spec)[:2] == ("data", "sp"), spec
