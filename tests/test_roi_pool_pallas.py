"""Pallas RoIPool kernel (interpret mode on CPU) vs the CUDA-semantics golden."""

import jax.numpy as jnp
import numpy as np
import pytest

import odwscl_tpu.ops.roi_pool_pallas as rp
from odwscl_tpu.ops.roi_pool import roi_pool_numpy


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = rp._run_fwd
    monkeypatch.setattr(rp, "_run_fwd",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def test_pallas_exact_for_level0_rois():
    rng = np.random.RandomState(0)
    h, w, c = 24, 32, 8
    feat = rng.randn(1, h, w, c).astype(np.float32)
    rois = np.array([
        [16.0, 8.0, 100.0, 90.0],
        [40.0, 40.0, 47.9, 47.9],
        [200.0, 150.0, 250.0, 180.0],
        [3.0, 5.0, 30.0, 100.0],
        [10.0, 10.0, 130.0, 120.0],   # ext exactly WIN
        [0.0, 0.0, 8.0, 8.0],
        [5.0, 5.0, 60.0, 60.0],
        [64.0, 64.0, 127.0, 127.0],
    ], dtype=np.float32)
    mask = np.ones((1, 8), bool)
    out = np.asarray(rp.roi_pool_tpu(jnp.array(feat), jnp.array(rois)[None],
                                     jnp.array(mask), 0.125))
    golden = roi_pool_numpy(feat[0], rois, 0.125)
    np.testing.assert_allclose(out[0], golden, atol=1e-6)


def test_pallas_large_roi_approximation_sane():
    """Pyramid levels pool over 2^l superblocks whose bin edges can both
    over- and under-cover the exact bins — assert the approximation stays
    finite and close in distribution (features ~ N(0,1))."""
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 24, 32, 8).astype(np.float32)
    rois = np.array([[0.0, 0.0, 255.0, 191.0]], dtype=np.float32)  # 33x25 cells
    out = np.asarray(rp.roi_pool_tpu(jnp.array(feat), jnp.array(rois)[None],
                                     jnp.ones((1, 1), bool), 0.125))[0, 0]
    golden = roi_pool_numpy(feat[0], rois, 0.125)[0]
    assert np.isfinite(out).all()
    assert np.abs(out - golden).mean() < 1.0
    # iid gaussian features are the worst case for superblock pooling (real
    # CNN features are spatially smooth); expect moderate correlation here.
    # TODO(perf/quality): double the row window for levels >= 1 to halve the
    # bin coarseness for large rois.
    assert np.corrcoef(out.ravel(), golden.ravel())[0, 1] > 0.25


def test_pallas_invalid_rois_zero():
    feat = np.ones((1, 16, 24, 8), np.float32)
    rois = np.array([[[0, 0, 63, 63], [0, 0, 63, 63]]], np.float32)
    mask = np.array([[True, False]])
    out = np.asarray(rp.roi_pool_tpu(jnp.array(feat), jnp.array(rois),
                                     jnp.array(mask), 0.125))
    assert out[0, 0].max() == 1.0
    assert out[0, 1].max() == 0.0
