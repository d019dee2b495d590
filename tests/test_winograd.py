"""Winograd F(4,3) conv vs direct conv (lax.conv) — exactness in f32,
bf16 error no worse than direct bf16 conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odwscl_tpu.ops.winograd import winograd_conv3x3, winograd_conv3x3_d2


def _direct(x, k, dilation=1):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32), (1, 1),
        [(dilation, dilation)] * 2, rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,cin,cout", [(8, 12, 8, 16), (16, 16, 16, 8)])
def test_f32_close_to_direct(h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    ref = _direct(x, k)
    got = winograd_conv3x3(x, k, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(8), jnp.float32)
    ref = _direct(x, k) + bias
    got = winograd_conv3x3(x, k, bias, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bf16_error_comparable_to_direct_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 32, 32) * 0.1, jnp.float32)
    ref = np.asarray(_direct(x, k))
    direct_bf16 = np.asarray(jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    wino_bf16 = np.asarray(
        winograd_conv3x3(x, k, compute_dtype=jnp.bfloat16)).astype(np.float32)
    scale = np.abs(ref).max()
    err_direct = np.abs(direct_bf16 - ref).max() / scale
    err_wino = np.abs(wino_bf16 - ref).max() / scale
    # Characterization: F(4,3) in bf16 loses ~25x more than direct bf16
    # (the A^T coefficients up to 8 amplify V's bf16 rounding). This plus
    # the 3.3x slowdown of the unfused XLA lowering (transform traffic) is
    # why the backbone default stays conv_impl="direct" — see
    # tools/bench_backbone.py. The op remains correct (f32 tests above)
    # and available for experimentation.
    assert err_direct < 5e-3
    assert err_wino < 8e-2, (err_wino, err_direct)


def test_dilated_phase_decomposition():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 24, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    ref = _direct(x, k, dilation=2)
    got = winograd_conv3x3_d2(x, k, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
