"""Fused Pallas Winograd conv vs the XLA winograd + direct conv.

Interpret-mode on CPU (conftest pins JAX_PLATFORMS=cpu); the hardware
path is validated + timed by tools/bench_wino.py on the TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _direct(x, k, b, dilation=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    p = dilation
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation), dimension_numbers=dn)
    return y + b


@pytest.mark.parametrize("h,w,cin,cout", [
    (16, 24, 128, 128),    # exact tile multiples
    (14, 21, 128, 256),    # ragged h/w -> row + tile padding paths
])
def test_matches_direct_conv(monkeypatch, h, w, cin, cout):
    monkeypatch.setenv("ODWSCL_PALLAS_INTERPRET", "1")
    from odwscl_tpu.ops import winograd_pallas as wp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32) * 0.05
    b = jnp.asarray(rng.randn(cout), jnp.float32) * 0.1

    ref = _direct(x, k, b)
    got = wp.winograd_conv3x3_pallas(x, k, b, ty=2).astype(jnp.float32)
    assert got.shape == ref.shape
    # bf16 GEMM operands: tolerance follows tests/test_winograd.py
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 0.08, err  # F(4,3) bf16 contract, = tests/test_winograd.py


def test_dilated_matches_direct(monkeypatch):
    monkeypatch.setenv("ODWSCL_PALLAS_INTERPRET", "1")
    from odwscl_tpu.ops import winograd_pallas as wp

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 24, 128), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(3, 3, 128, 128), jnp.float32) * 0.05
    b = jnp.asarray(rng.randn(128), jnp.float32) * 0.1

    ref = _direct(x, k, b, dilation=2)
    got = wp.winograd_conv3x3_d2_pallas(x, k, b, ty=2).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 0.08, err  # F(4,3) bf16 contract, = tests/test_winograd.py


def test_relu_fusion_and_feasibility(monkeypatch):
    monkeypatch.setenv("ODWSCL_PALLAS_INTERPRET", "1")
    from odwscl_tpu.ops import winograd_pallas as wp

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 16, 128), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 128, 128), jnp.float32) * 0.05
    b = jnp.zeros((128,), jnp.float32)
    y = wp.winograd_conv3x3_pallas(x, k, b, ty=2, relu=True)
    assert float(jnp.min(y.astype(jnp.float32))) >= 0.0

    assert wp.winograd_pallas_feasible(104, 168, 512, 512)
    assert wp.winograd_pallas_feasible(416, 672, 128, 128)
    assert not wp.winograd_pallas_feasible(832, 1344, 64, 64)   # cin % 128
