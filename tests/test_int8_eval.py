"""int8 dynamic-quantized eval path (ops/quant.py, TPU.INT8_EVAL).

The quantized serving path must (a) be numerically close to the bf16
eval matmuls it replaces, (b) share the exact param tree with the bf16
neck so checkpoints/importers are unaffected, and (c) leave the training
path bit-identical (the gate only fires when train=False).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.ops.quant import quantize_weights, dense_int8
from odwscl_tpu.models.vgg16 import VGGRoINeck


def test_quantize_weights_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_weights(w)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    # per-channel symmetric int8: worst-case error is half a step
    step = np.asarray(s)[0]
    assert np.all(np.abs(back - np.asarray(w)) <= 0.5 * step + 1e-7)


def test_dense_int8_close_to_f32():
    rng = np.random.RandomState(1)
    # rows with wildly different magnitudes — the per-row activation
    # scale must track each independently
    x = rng.randn(16, 256).astype(np.float32)
    x *= np.logspace(-2, 2, 16)[:, None].astype(np.float32)
    w = rng.randn(256, 128).astype(np.float32)
    b = rng.randn(128).astype(np.float32)
    got = np.asarray(dense_int8(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), out_dtype=jnp.float32))
    ref = x @ w + b
    scale = np.abs(ref).max(axis=-1, keepdims=True) + 1e-6
    assert np.abs(got - ref).max(axis=-1, keepdims=True).max() < 2e-2 * scale.max()
    # relative error per row stays small despite the 1e4 magnitude spread
    rel = np.abs(got - ref) / scale
    assert rel.max() < 2e-2, rel.max()


def test_dense_int8_prequantized_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    a = dense_int8(x, w, None, jnp.float32)
    b = dense_int8(x, w, None, jnp.float32, wq=quantize_weights(w))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tiny_neck_io(int8):
    neck = VGGRoINeck(hidden_dim=128, int8_eval=int8,
                      compute_dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 7, 7, 8).astype(np.float32))
    params = neck.init(jax.random.PRNGKey(0), x)
    return neck, params, x


def test_neck_param_tree_identical_across_paths():
    _, p8, _ = _tiny_neck_io(True)
    _, pf, _ = _tiny_neck_io(False)
    t8 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p8)
    tf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), pf)
    assert t8 == tf


def test_neck_int8_eval_close_and_train_exact():
    neck8, params, x = _tiny_neck_io(True)
    neckf = VGGRoINeck(hidden_dim=128, int8_eval=False,
                       compute_dtype=jnp.float32)
    # eval: close (quantization noise only)
    y8 = np.asarray(neck8.apply(params, x, train=False))
    yf = np.asarray(neckf.apply(params, x, train=False))
    scale = np.abs(yf).max() + 1e-6
    assert np.abs(y8 - yf).max() / scale < 5e-2
    # train: the int8 gate must not fire — bit-identical to the bf16 path
    key = jax.random.PRNGKey(7)
    y8t = np.asarray(neck8.apply(params, x, train=True,
                                 rngs={"dropout": key}))
    yft = np.asarray(neckf.apply(params, x, train=True,
                                 rngs={"dropout": key}))
    np.testing.assert_array_equal(y8t, yft)


# ---------------------------------------------------------------------------
# int8 conv stack (TPU.INT8_EVAL_CONVS, ops/quant.py conv2d_int8)
# ---------------------------------------------------------------------------

def test_conv2d_int8_close_to_f32():
    from odwscl_tpu.ops.quant import conv2d_int8

    rng = np.random.RandomState(4)
    x = jnp.asarray(np.maximum(rng.randn(2, 12, 14, 16), 0)
                    .astype(np.float32))           # post-ReLU activations
    w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    # (1,1)/(2,2) are the backbone's SAME-output combos; (1,0) exercises a
    # VALID-output shape (the r3 GEMM lowering silently mis-handled it —
    # ADVICE r3; the r4 conv lowering is shape-general)
    for dil, pad in [(1, 1), (2, 2), (1, 0)]:
        got = np.asarray(conv2d_int8(x, w, b, dilation=dil, padding=pad,
                                     out_dtype=jnp.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = np.asarray(jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil), dimension_numbers=dn)
            + b[None, None, None])
        scale = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / scale < 3e-2, (dil, pad)


def test_backbone_int8_param_tree_and_train_path():
    """int8 conv path: same param tree as the bf16 backbone; fast_eval=False
    (train) is bit-identical to the plain backbone."""
    from odwscl_tpu.models.vgg16 import VGGBackbone

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    b8 = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                     int8_eval=True)
    bf = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32)
    p8 = jax.jit(b8.init)(jax.random.PRNGKey(0), x)
    pf = jax.jit(bf.init)(jax.random.PRNGKey(0), x)
    t8 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p8)
    tf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), pf)
    assert t8 == tf
    y_train = np.asarray(jax.jit(b8.apply)(p8, x))
    y_plain = np.asarray(jax.jit(bf.apply)(p8, x))
    np.testing.assert_array_equal(y_train, y_plain)
    # eval fast path runs and stays close (quantization noise compounds
    # through 11 int8 convs; bound is loose but catches wiring errors)
    y8 = np.asarray(jax.jit(lambda p, x: b8.apply(p, x, fast_eval=True))(p8, x))
    scale = np.abs(y_plain).max() + 1e-6
    assert y8.shape == y_plain.shape
    assert np.abs(y8 - y_plain).max() / scale < 0.25


def test_backbone_int8_static_calibrated():
    """Static-calibrated serving mode (TPU.INT8_STATIC): a calibration
    apply records per-layer activation abs-maxes into the "quant"
    collection (and itself computes the plain float forward); the static
    eval path then matches the dynamic int8 path exactly on the
    calibration batch (same scales by construction) and stays close on a
    fresh batch."""
    from odwscl_tpu.models.vgg16 import VGGBackbone

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    bdyn = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                       int8_eval=True)
    bstat = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                        int8_eval=True, int8_static=True)
    params = jax.jit(bdyn.init)(jax.random.PRNGKey(0), x)

    # calibration computes the plain float forward while recording scales
    y_cal, quant = jax.jit(
        lambda p, x: bstat.apply(p, x, fast_eval=True, calibrate=True,
                                 mutable=["quant"]))(params, x)
    y_plain = np.asarray(jax.jit(bdyn.apply)(params, x))
    np.testing.assert_allclose(np.asarray(y_cal), y_plain, rtol=1e-5,
                               atol=1e-5)
    # per-channel abs-max vectors (round 5): every layer records a [Cin]
    # vector; at least its max must be positive (dead post-ReLU channels
    # may legitimately record 0)
    assert all(np.asarray(v).max() > 0 for v in
               jax.tree_util.tree_leaves(quant["quant"]))

    # static scales come from CLEAN calibration activations while the
    # dynamic path re-measures its own quantized activations (standard
    # PTQ) — so compare both against the float forward, not each other
    vstat = {"params": params["params"], **quant}
    scale = np.abs(y_plain).max() + 1e-6
    y_stat = np.asarray(jax.jit(
        lambda v, x: bstat.apply(v, x, fast_eval=True))(vstat, x))
    assert np.abs(y_stat - y_plain).max() / scale < 0.25

    # fresh batch: calibrated scales transfer (clip handles the tail)
    x2 = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 0.7)
    y_stat2 = np.asarray(jax.jit(
        lambda v, x: bstat.apply(v, x, fast_eval=True))(vstat, x2))
    y_plain2 = np.asarray(jax.jit(bdyn.apply)(params, x2))
    scale2 = np.abs(y_plain2).max() + 1e-6
    assert np.abs(y_stat2 - y_plain2).max() / scale2 < 0.25


def test_calibration_accumulates_running_max_and_persists(tmp_path):
    """Multi-batch calibration (engine/inference.py calibrate): sweeping a
    second batch takes max(recorded, batch) per layer; save/load_int8_scales
    round-trips the quant tree exactly."""
    from odwscl_tpu.models.vgg16 import VGGBackbone
    from odwscl_tpu.engine.inference import (save_int8_scales,
                                             load_int8_scales)

    rng = np.random.RandomState(7)
    x1 = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 3.0)
    bstat = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                        int8_eval=True, int8_static=True)
    params = jax.jit(bstat.init)(jax.random.PRNGKey(0), x1)
    cal = jax.jit(lambda v, x: bstat.apply(
        v, x, fast_eval=True, calibrate=True, mutable=["quant"]))

    _, q1 = cal(params, x1)
    _, q12 = cal({**params, **q1}, x2)          # second sweep, carried quant
    _, q2 = cal(params, x2)
    l1 = jax.tree_util.tree_leaves(q1["quant"])
    l2 = jax.tree_util.tree_leaves(q2["quant"])
    l12 = jax.tree_util.tree_leaves(q12["quant"])
    for a, b, m in zip(l1, l2, l12):
        np.testing.assert_allclose(np.asarray(m),
                                   np.maximum(np.asarray(a), np.asarray(b)),
                                   rtol=1e-6)
    assert any(np.any(np.asarray(m) > np.asarray(a))
               for a, m in zip(l1, l12))

    path = str(tmp_path / "int8_scales.npz")
    save_int8_scales(path, q12)
    loaded = load_int8_scales(path)
    fa, ta = jax.tree_util.tree_flatten_with_path(q12["quant"])
    fb, tb = jax.tree_util.tree_flatten_with_path(loaded["quant"])
    assert ta == tb
    for (pa, va), (pb, vb) in zip(fa, fb):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_conv2d_int8_per_channel_fold_exact():
    """Per-channel activation scales (round 5): the [Cin] act_scale path
    must equal the explicit reference — quantize x per channel, fold the
    per-channel scale into the kernel's Cin axis, run the scalar-free int8
    conv. Folding is exact, so build the reference by hand."""
    from odwscl_tpu.ops.quant import conv2d_int8

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32) * 5)
    k = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    sa_vec = jnp.asarray(np.abs(rng.randn(16)).astype(np.float32) * 6 + 1)

    got = np.asarray(conv2d_int8(x, k, b, out_dtype=jnp.float32,
                                 act_scale=sa_vec))

    sa = np.maximum(np.asarray(sa_vec), 1e-12) / 127.0
    xq = np.clip(np.round(np.asarray(x) / sa), -127, 127)
    kf = np.asarray(k) * sa[None, None, :, None]
    ks = np.maximum(np.abs(kf).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    kq = np.clip(np.round(kf / ks), -127, 127)
    import jax as _jax
    dn = _jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    acc = np.asarray(_jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(kq, jnp.float32),
        (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn))
    want = acc * ks + np.asarray(b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_conv2d_int8_per_channel_tighter_than_per_tensor():
    """With channels of very different dynamic range, per-channel scales
    must beat one tensor scale against the f32 conv."""
    from odwscl_tpu.ops.quant import conv2d_int8, conv2d_ref

    rng = np.random.RandomState(12)
    # channel magnitudes spanning 100x — the per-tensor scale wastes most
    # of the int8 range on the small channels
    mags = np.logspace(0, 2, 16).astype(np.float32)
    x = jnp.asarray(rng.randn(1, 12, 12, 16).astype(np.float32) * mags)
    k = jnp.asarray((rng.randn(3, 3, 16, 32) / mags[None, None, :, None]
                     ).astype(np.float32))
    want = np.asarray(conv2d_ref(x, k, None, out_dtype=jnp.float32))
    scale = np.abs(want).max()
    sa_vec = jnp.asarray(np.abs(np.asarray(x)).max(axis=(0, 1, 2)))
    sa_scalar = jnp.asarray(np.abs(np.asarray(x)).max())
    err_pc = np.abs(np.asarray(conv2d_int8(
        x, k, None, out_dtype=jnp.float32, act_scale=sa_vec)) - want).max()
    err_pt = np.abs(np.asarray(conv2d_int8(
        x, k, None, out_dtype=jnp.float32, act_scale=sa_scalar)) - want).max()
    assert err_pc < err_pt * 0.25, (err_pc / scale, err_pt / scale)


def test_int8_bf16_fallback_layers():
    """TPU.INT8_BF16_LAYERS: listed conv indices run the bf16 reference
    conv inside the int8 stack; listing every quantized layer reproduces
    the plain float forward."""
    from odwscl_tpu.models.vgg16 import VGGBackbone

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    plain = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32)
    params = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    y_plain = np.asarray(jax.jit(plain.apply)(params, x))

    all_fallback = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                               int8_eval=True,
                               int8_bf16_layers=tuple(range(2, 13)))
    y_fb = np.asarray(jax.jit(
        lambda p, x: all_fallback.apply(p, x, fast_eval=True))(params, x))
    np.testing.assert_allclose(y_fb, y_plain, rtol=1e-5, atol=1e-5)

    # partial fallback: runs, params unchanged, closer to plain than full
    # quantization on this input
    some = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                       int8_eval=True, int8_bf16_layers=(2, 3))
    y_some = np.asarray(jax.jit(
        lambda p, x: some.apply(p, x, fast_eval=True))(params, x))
    none = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                       int8_eval=True)
    y_none = np.asarray(jax.jit(
        lambda p, x: none.apply(p, x, fast_eval=True))(params, x))
    scale = np.abs(y_plain).max() + 1e-6
    assert np.abs(y_some - y_plain).max() <= np.abs(y_none - y_plain).max() * 1.5
    assert np.isfinite(y_some).all()
