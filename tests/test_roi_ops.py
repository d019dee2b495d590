"""RoI pooling ops vs the golden transcription of the CUDA kernels."""

import numpy as np
import jax.numpy as jnp

from odwscl_tpu.ops import roi_pool, roi_pool_numpy, roi_align


def test_roi_pool_matches_cuda_semantics():
    rng = np.random.RandomState(0)
    h, w, c = 24, 32, 8
    feat = rng.randn(h, w, c).astype(np.float32)
    # image coords at scale 0.125 -> feature cells
    rois = np.array([
        [0.0, 0.0, 255.0, 191.0],     # whole image
        [16.0, 8.0, 100.0, 90.0],
        [40.0, 40.0, 47.9, 47.9],     # tiny -> 1x1-ish
        [200.0, 150.0, 250.0, 180.0],
        [3.0, 5.0, 30.0, 160.0],
    ], dtype=np.float32)
    golden = roi_pool_numpy(feat, rois, 0.125, pooled=7)
    # win=64 >= every roi extent here -> the exact path everywhere
    got = roi_pool(jnp.array(feat)[None], jnp.array(rois)[None],
                   jnp.ones((1, len(rois)), bool), 0.125, pooled=7, win=64)
    np.testing.assert_allclose(np.asarray(got[0]), golden, atol=1e-6)


def test_roi_pool_oversized_roi_subsample_bounded():
    """Rois larger than the window take a strided-subsample path; the result
    must still be a max over a subset of each bin (<= exact max)."""
    rng = np.random.RandomState(1)
    feat = rng.randn(24, 32, 4).astype(np.float32)
    rois = np.array([[0.0, 0.0, 255.0, 191.0]], dtype=np.float32)
    golden = roi_pool_numpy(feat, rois, 0.125, pooled=7)
    got = np.asarray(roi_pool(jnp.array(feat)[None], jnp.array(rois)[None],
                              jnp.ones((1, 1), bool), 0.125, pooled=7, win=16))[0]
    assert np.all(got <= golden + 1e-6)
    # and with an adequate window it is exact
    got64 = np.asarray(roi_pool(jnp.array(feat)[None], jnp.array(rois)[None],
                                jnp.ones((1, 1), bool), 0.125, pooled=7, win=64))[0]
    np.testing.assert_allclose(got64, golden, atol=1e-6)


def test_roi_pool_invalid_rois_zero():
    feat = np.ones((8, 8, 4), dtype=np.float32)
    rois = np.array([[0, 0, 63, 63], [0, 0, 63, 63]], dtype=np.float32)
    mask = np.array([True, False])
    out = np.asarray(roi_pool(jnp.array(feat)[None], jnp.array(rois)[None],
                              jnp.array(mask)[None], 0.125))
    assert out[0, 0].max() == 1.0
    assert out[0, 1].max() == 0.0


def test_roi_pool_grad_flows():
    import jax
    feat = jnp.ones((1, 8, 8, 4))
    rois = jnp.array([[[0.0, 0.0, 63.0, 63.0]]])
    mask = jnp.ones((1, 1), bool)

    def f(x):
        return roi_pool(x, rois, mask, 0.125).sum()

    g = jax.grad(f)(feat)
    assert float(jnp.abs(g).sum()) > 0


def test_roi_align_basic():
    # constant feature -> every bin averages to the constant
    feat = np.full((16, 16, 3), 2.5, dtype=np.float32)
    rois = np.array([[8.0, 8.0, 100.0, 100.0]], dtype=np.float32)
    out = np.asarray(roi_align(jnp.array(feat)[None], jnp.array(rois)[None],
                               jnp.ones((1, 1), bool), 0.125))
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


def test_roi_align_linear_ramp():
    # bilinear sampling of a linear ramp reproduces the ramp at sample centers
    h = w = 16
    ramp = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)[..., None]
    rois = np.array([[0.0, 0.0, 127.0, 127.0]], dtype=np.float32)  # scale .125 -> 0..15.875
    out = np.asarray(roi_align(jnp.array(ramp)[None], jnp.array(rois)[None],
                               jnp.ones((1, 1), bool), 0.125, pooled=4, sampling=2))[0, 0]
    # column centers increase monotonically
    cols = out[:, :, 0].mean(axis=0)
    assert np.all(np.diff(cols) > 0)
