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


def roi_align_numpy(feat, rois, spatial_scale, pooled=7, sampling=0):
    """Golden transcription of ROIAlign_cuda.cu:70-118 (adaptive grid incl.)."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), pooled, pooled, c), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y, x = max(y, 0.0), max(x, 0.0)
        y0, x0 = int(y), int(x)
        if y0 >= h - 1:
            y0 = y1 = h - 1
            y = float(y0)
        else:
            y1 = y0 + 1
        if x0 >= w - 1:
            x0 = x1 = w - 1
            x = float(x0)
        else:
            x1 = x0 + 1
        ly, lx = y - y0, x - x0
        hy, hx = 1.0 - ly, 1.0 - lx
        return (hy * hx * feat[y0, x0] + hy * lx * feat[y0, x1]
                + ly * hx * feat[y1, x0] + ly * lx * feat[y1, x1])

    for n, roi in enumerate(rois):
        x1, y1, x2, y2 = [v * spatial_scale for v in roi]
        rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bh, bw = rh / pooled, rw / pooled
        gh = sampling if sampling > 0 else int(np.ceil(rh / pooled))
        gw = sampling if sampling > 0 else int(np.ceil(rw / pooled))
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(c, np.float32)
                for iy in range(gh):
                    y = y1 + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        x = x1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += bilinear(y, x)
                out[n, ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_adaptive_sampling_golden():
    """sampling_ratio=0 must follow the CUDA per-roi ceil(roi/pooled) grid
    (VERDICT r1 #9: round 1 silently used a fixed 2-sample grid)."""
    rng = np.random.RandomState(7)
    feat = rng.randn(24, 30, 4).astype(np.float32)
    rois = np.array([
        [8.0, 8.0, 100.0, 100.0],      # grid 1x1 per bin
        [0.0, 0.0, 180.0, 120.0],      # mixed grid sizes
        [4.0, 4.0, 470.0, 370.0],      # large: grid up to 9x7
        [50.0, 50.0, 40.0, 40.0],      # malformed -> 1x1 roi
        [100.0, 90.0, 111.0, 101.0],   # sub-bin roi
    ], np.float32)
    for sampling in (0, 2):
        out = np.asarray(roi_align(jnp.array(feat)[None],
                                   jnp.array(rois)[None],
                                   jnp.ones((1, len(rois)), bool), 0.0625,
                                   sampling=sampling))
        golden = roi_align_numpy(feat, rois, 0.0625, sampling=sampling)
        np.testing.assert_allclose(out[0], golden, atol=2e-5, rtol=1e-5)


def test_roi_align_chunked_matches_unchunked():
    rng = np.random.RandomState(8)
    feat = rng.randn(1, 16, 16, 3).astype(np.float32)
    rois = rng.uniform(0, 100, (1, 10, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[..., :2], rois[..., 2:]),
                           np.maximum(rois[..., :2], rois[..., 2:])], -1)
    mask = np.ones((1, 10), bool)
    a = np.asarray(roi_align(jnp.array(feat), jnp.array(rois),
                             jnp.array(mask), 0.125, chunk=4))
    b = np.asarray(roi_align(jnp.array(feat), jnp.array(rois),
                             jnp.array(mask), 0.125, chunk=64))
    np.testing.assert_allclose(a, b, atol=1e-6)
