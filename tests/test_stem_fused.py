"""Fused conv1_2+pool kernel (ops/stem_fused.py) vs the direct XLA conv it
replaces, in Pallas interpret mode (CPU). Hardware timing/validation:
tools/bench_stem.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.ops.stem_fused import conv12_pool_fused, stem_fused_feasible


def _direct(y1, w2, b2):
    dn = jax.lax.conv_dimension_numbers(y1.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(y1.astype(jnp.bfloat16),
                                     w2.astype(jnp.bfloat16), (1, 1),
                                     [(1, 1), (1, 1)], dimension_numbers=dn)
    y = jax.nn.relu(y + b2.astype(jnp.bfloat16))
    b, h, w, c = y.shape
    return y.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


@pytest.mark.parametrize("b,h,w", [(1, 32, 64), (2, 96, 32)])
def test_conv12_pool_fused_matches_direct(b, h, w):
    assert stem_fused_feasible(h, w)
    rng = np.random.RandomState(0)
    y1 = jnp.asarray(np.maximum(rng.randn(b, h, w, 64), 0)
                     .astype(np.float32))          # post-ReLU activations
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    got = np.asarray(conv12_pool_fused(y1, w2, b2, interpret=True),
                     np.float32)
    ref = np.asarray(_direct(y1, w2, b2), np.float32)
    assert got.shape == ref.shape == (b, h // 2, w // 2, 64)
    scale = np.abs(ref).max() + 1e-6
    # same math, different accumulation order (f32 accum both, bf16 bias)
    assert np.abs(got - ref).max() / scale < 2e-2, np.abs(got - ref).max()


def test_conv12_pool_fused_edges_exact():
    """Constant input exposes SAME-padding/halo mistakes at strip seams
    and image borders (h=96 -> 3 strips)."""
    y1 = jnp.ones((1, 96, 32, 64), jnp.float32)
    w2 = jnp.full((3, 3, 64, 64), 0.001, jnp.float32)
    b2 = jnp.zeros((64,), jnp.float32)
    got = np.asarray(conv12_pool_fused(y1, w2, b2, interpret=True),
                     np.float32)
    ref = np.asarray(_direct(y1, w2, b2), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2)
    # interior analytic: 9 taps * 64 ch * 0.001
    assert abs(got[0, 24, 8, 0] - 9 * 64 * 0.001) / 0.576 < 0.02
