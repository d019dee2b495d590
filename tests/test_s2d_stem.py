"""Parity tests for the space-to-depth VGG stem (ops/s2d_stem.py).

The s2d stem is a pure re-association of the direct path
pool1(relu(conv1_2(relu(conv1_1(x))))) (reference layer structure:
wetectron/modeling/backbone/vgg16.py:66-84) — same multiplies, different
accumulation order. So f32 parity must be near machine precision and bf16
drift must be small and bounded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odwscl_tpu.ops.s2d_stem import stem_s2d


def _direct_stem(x, k1, b1, k2, b2, dtype):
    """conv1_1 -> relu -> conv1_2 -> relu -> maxpool2x2, as nn.Conv does."""
    x = x.astype(dtype)
    for k, b in ((k1, b1), (k2, b2)):
        x = jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(x + b.astype(dtype), 0)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _mk(rng, b=2, h=24, w=32, cin=3, c1=8, c2=8):
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, cin, c1) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(c1) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, c1, c2) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(c2) * 0.1, jnp.float32)
    return x, k1, b1, k2, b2


@pytest.mark.parametrize("shape", [(2, 24, 32), (1, 16, 16), (3, 30, 44)])
def test_f32_parity(shape):
    b, h, w = shape
    x, k1, b1, k2, b2 = _mk(np.random.RandomState(0), b=b, h=h, w=w)
    want = _direct_stem(x, k1, b1, k2, b2, jnp.float32)
    got = stem_s2d(x, k1, b1, k2, b2, compute_dtype=jnp.float32)
    assert got.shape == want.shape == (b, h // 2, w // 2, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_drift_bounded():
    x, k1, b1, k2, b2 = _mk(np.random.RandomState(1), b=2, h=32, w=48,
                            c1=16, c2=16)
    ref = np.asarray(_direct_stem(x, k1, b1, k2, b2, jnp.float32))
    got = np.asarray(stem_s2d(x, k1, b1, k2, b2,
                              compute_dtype=jnp.bfloat16), np.float32)
    direct_bf16 = np.asarray(_direct_stem(x, k1, b1, k2, b2, jnp.bfloat16),
                             np.float32)
    scale = np.abs(ref).max()
    # s2d-vs-f32 drift must be comparable to direct-bf16-vs-f32 drift:
    # same precision contract, only the accumulation order differs.
    d_s2d = np.abs(got - ref).max() / scale
    d_dir = np.abs(direct_bf16 - ref).max() / scale
    assert d_s2d < max(4 * d_dir, 0.02), (d_s2d, d_dir)


def test_grad_parity_f32():
    """Weight/input grads re-associate too (freeze_at<2 training path)."""
    x, k1, b1, k2, b2 = _mk(np.random.RandomState(2), b=1, h=16, w=16)

    def loss_direct(args):
        return (_direct_stem(*args, jnp.float32) ** 2).sum()

    def loss_s2d(args):
        return (stem_s2d(*args, compute_dtype=jnp.float32) ** 2).sum()

    args = (x, k1, b1, k2, b2)
    g_want = jax.grad(loss_direct)(args)
    g_got = jax.grad(loss_s2d)(args)
    for a, b in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_odd_shape_rejected():
    x, k1, b1, k2, b2 = _mk(np.random.RandomState(3), h=15, w=16)
    with pytest.raises(AssertionError):
        stem_s2d(x, k1, b1, k2, b2)


def test_backbone_flag_parity():
    """VGGBackbone(s2d_stem=True) == default backbone in f32, same params."""
    from odwscl_tpu.models.vgg16 import VGGBackbone

    x = jnp.asarray(np.random.RandomState(4).randn(1, 32, 32, 3), jnp.float32)
    base = VGGBackbone(compute_dtype=jnp.float32)
    fast = VGGBackbone(compute_dtype=jnp.float32, s2d_stem=True)
    params = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(params, x)
    got = fast.apply(params, x)  # identical param tree by construction
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_s2d_composes_with_int8_convs():
    """The shipped serving recipe stacks TPU.S2D_STEM (exact, bf16 stem)
    with TPU.INT8_EVAL_CONVS (quantized conv2_1+); the stem swap must not
    change the param tree or blow up the int8 drift bound."""
    from odwscl_tpu.models.vgg16 import VGGBackbone

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    plain = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32)
    combo = VGGBackbone(arch="VGG16-OICR", compute_dtype=jnp.float32,
                        int8_eval=True, s2d_stem=True)
    params = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    t_combo = jax.tree_util.tree_map(
        lambda a: (a.shape, str(a.dtype)),
        jax.jit(combo.init)(jax.random.PRNGKey(0), x))
    t_plain = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                     params)
    assert t_combo == t_plain
    y_ref = np.asarray(jax.jit(plain.apply)(params, x))
    y = np.asarray(jax.jit(
        lambda p, x: combo.apply(p, x, fast_eval=True))(params, x))
    scale = np.abs(y_ref).max() + 1e-6
    assert np.abs(y - y_ref).max() / scale < 0.25  # int8-drift bound only
    # without fast_eval (train path) the combo is s2d-exact vs plain
    y_train = np.asarray(jax.jit(combo.apply)(params, x))
    np.testing.assert_allclose(y_train, y_ref, rtol=2e-4, atol=2e-4)
