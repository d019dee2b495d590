"""Pallas RoIPool v2 (interpret mode on CPU) vs the CUDA-semantics golden.

VERDICT r1 #2: the kernel must pool bit-exactly for EVERY roi size (SS/MCG
proposals span up to 2000 px), replacing the round-1 pyramid approximation.

Interpret mode is ~1000x slower than compiled, so the default suite runs two
compact cases (still covering the small/large kernel classes, invalid rois
and the backward); the dense size sweeps run with ODWSCL_RUN_SLOW=1 and,
compiled on real hardware, via tools/validate_roi_pool_tpu.py.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import odwscl_tpu.ops.roi_pool_pallas as rp
from odwscl_tpu.ops.roi_pool import roi_pool, roi_pool_numpy

slow = pytest.mark.skipif(os.environ.get("ODWSCL_RUN_SLOW") != "1",
                          reason="set ODWSCL_RUN_SLOW=1 to run")


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    for name in ("_run_fwd", "_run_bwd"):
        monkeypatch.setattr(rp, name, functools.partial(getattr(rp, name),
                                                        interpret=True))
    monkeypatch.setattr(rp, "CHUNK", 2)


def test_exact_small_large_and_invalid():
    """One call covering: small roi (class 0), wide-large roi spanning the
    map with a dynamic strip loop (class 2), and an invalid roi -> 0."""
    rng = np.random.RandomState(0)
    feat = rng.randn(1, 24, 32, 8).astype(np.float32)
    rois = np.array([
        [16.0, 8.0, 100.0, 90.0],     # small
        [0.0, 0.0, 255.0, 191.0],     # 33x25 cells, strip-streamed
        [0.0, 0.0, 255.0, 191.0],     # same roi, masked invalid
        [130.0, 90.0, 120.0, 80.0],   # malformed (x2<x1) -> 1x1 cell
    ], dtype=np.float32)
    mask = np.array([[True, True, False, True]])
    out = np.asarray(rp.roi_pool_tpu(jnp.array(feat), jnp.array(rois)[None],
                                     jnp.array(mask), 0.125))
    golden = roi_pool_numpy(feat[0], rois, 0.125)
    np.testing.assert_allclose(out[0, 0], golden[0], atol=0, rtol=0)
    np.testing.assert_allclose(out[0, 1], golden[1], atol=0, rtol=0)
    assert np.all(out[0, 2] == 0.0)
    np.testing.assert_allclose(out[0, 3], golden[3], atol=0, rtol=0)


def test_backward_matches_xla_vjp():
    """Argmax routing vs the exact XLA pooler's VJP (continuous random
    features -> no ties, so eq-routing == argmax routing). Covers the
    small path, the strip-loop path and an off-image roi."""
    rng = np.random.RandomState(3)
    feat = jnp.array(rng.randn(1, 16, 24, 8).astype(np.float32))
    rois = jnp.array(np.array([
        [16.0, 8.0, 100.0, 90.0],      # small
        [0.0, 0.0, 180.0, 120.0],      # large (strip loop)
        [-40.0, -40.0, 50.0, 60.0],    # hangs off the top-left corner
        [0.0, 0.0, 500.0, 500.0],      # exceeds the map on both axes
    ], np.float32))[None]
    mask = jnp.ones((1, 4), bool)
    g = jnp.array(rng.randn(1, 4, 7, 7, 8).astype(np.float32))

    def loss_pallas(f):
        return jnp.vdot(rp.roi_pool_tpu(f, rois, mask, 0.125), g)

    def loss_xla(f):
        # win=80 >= the largest roi extent in CELLS (the 500px roi spans 64
        # cells) -> the XLA path samples at stride 1, i.e. exactly
        return jnp.vdot(roi_pool(f, rois, mask, 0.125, 7, win=80), g)

    d_pallas = jax.grad(loss_pallas)(feat)
    d_xla = jax.grad(loss_xla)(feat)
    np.testing.assert_allclose(np.asarray(d_pallas), np.asarray(d_xla),
                               atol=1e-5, rtol=1e-5)


def test_shallow_table_stepped_loads():
    """Force a 3-level sparse table so tall rois exercise the stepped
    top-level loads (on hardware this path runs when VMEM caps the table
    depth). Covers fwd and bwd."""
    rng = np.random.RandomState(7)
    feat = rng.randn(1, 40, 32, 8).astype(np.float32)
    rois = np.array([
        [0.0, 0.0, 200.0, 319.0],     # 26 rows -> bins ~4 rows, some steps
        [8.0, 0.0, 100.0, 310.0],     # tall narrow
        [16.0, 8.0, 100.0, 90.0],     # small (no steps)
    ], dtype=np.float32)
    mask = np.ones((1, 3), bool)
    orig_plan = rp._plan
    rp._plan = lambda c, hp, wp, isz, bwd: (3, c)
    try:
        fj = jnp.array(feat)
        rj = jnp.array(rois)[None]
        mj = jnp.array(mask)
        out = np.asarray(rp.roi_pool_tpu(fj, rj, mj, 0.125))
        golden = roi_pool_numpy(feat[0], rois, 0.125)
        np.testing.assert_allclose(out[0], golden, atol=0, rtol=0)
        g = jnp.array(rng.randn(1, 3, 7, 7, 8).astype(np.float32))
        d_pal = jax.grad(
            lambda f: jnp.vdot(rp.roi_pool_tpu(f, rj, mj, 0.125), g))(fj)
    finally:
        rp._plan = orig_plan
    d_xla = jax.grad(
        lambda f: jnp.vdot(roi_pool(f, rj, mj, 0.125, 7, win=48), g))(fj)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_xla),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# opt-in dense sweeps (interpret mode; minutes each). The same sweeps run
# compiled on hardware via tools/validate_roi_pool_tpu.py.
# ---------------------------------------------------------------------------

def sweep_rois():
    """Rois covering every size class at stride 8: small (<=128 px),
    narrow-large, wide-large up to 2000 px, degenerate, off-image."""
    return np.array([
        [16.0, 8.0, 100.0, 90.0],
        [40.0, 40.0, 47.9, 47.9],
        [3.0, 5.0, 30.0, 100.0],
        [0.0, 0.0, 8.0, 8.0],
        [10.0, 10.0, 130.0, 120.0],      # ext exactly WIN
        [5.0, 5.0, 230.0, 110.0],        # narrow-large
        [5.0, 5.0, 60.0, 500.0],         # tall narrow-large
        [0.0, 0.0, 255.0, 191.0],
        [0.0, 0.0, 1990.0, 1480.0],      # near full-map wide-large
        [300.0, 200.0, 1999.0, 1501.0],
        [-50.0, -30.0, 100.0, 80.0],
        [1400.0, 1100.0, 2300.0, 1900.0],
        [130.0, 90.0, 120.0, 80.0],      # malformed
        [56.0, 56.0, 56.0, 56.0],        # single cell
        [0.0, 0.0, 447.0, 447.0],
        [8.0, 8.0, 119.0, 119.0],
    ], dtype=np.float32)


@slow
def test_pallas_exact_full_sweep():
    rng = np.random.RandomState(0)
    h, w = 188, 250
    feat = rng.randn(1, h, w, 8).astype(np.float32)
    rois = sweep_rois()
    mask = np.ones((1, len(rois)), bool)
    out = np.asarray(rp.roi_pool_tpu(jnp.array(feat), jnp.array(rois)[None],
                                     jnp.array(mask), 0.125))
    golden = roi_pool_numpy(feat[0], rois, 0.125)
    np.testing.assert_allclose(out[0], golden, atol=0, rtol=0)


@slow
def test_pallas_exact_size_grid():
    """Dense sweep of roi extents 1..260 cells (8..2080 px)."""
    rng = np.random.RandomState(1)
    h, w = 200, 260
    feat = rng.randn(1, h, w, 8).astype(np.float32)
    sizes = [1, 2, 3, 7, 9, 15, 16, 17, 18, 33, 34, 64, 100, 160, 259]
    rois = []
    for i, sy in enumerate(sizes):
        sx = sizes[(i * 7 + 3) % len(sizes)]
        y0 = (i * 13) % max(h - sy, 1)
        x0 = (i * 29) % max(w - sx, 1)
        rois.append([x0 * 8.0, y0 * 8.0, (x0 + sx) * 8.0 - 1,
                     (y0 + sy) * 8.0 - 1])
    rois = np.array(rois, np.float32)
    mask = np.ones((1, len(rois)), bool)
    out = np.asarray(rp.roi_pool_tpu(jnp.array(feat), jnp.array(rois)[None],
                                     jnp.array(mask), 0.125))
    golden = roi_pool_numpy(feat[0], rois, 0.125)
    np.testing.assert_allclose(out[0], golden, atol=0, rtol=0)


def test_backward_first_argmax_on_ties():
    """v5 tie semantics = the CUDA kernel's stored argmax
    (ROIPool_cuda.cu:30-60: `if (val > maxval)` scanning y then x keeps
    the FIRST row-major maximum; the backward scatters each bin's whole
    cotangent to that one cell). Features are built with deliberate
    duplicated maxima inside bins; expected gradients computed by a
    direct numpy transcription of the CUDA scan order."""
    rng = np.random.RandomState(11)
    h, w, c = 16, 24, 8
    # quantize features so exact ties are everywhere
    feat = np.round(rng.randn(1, h, w, c) * 2).astype(np.float32)
    rois = np.array([
        [16.0, 8.0, 100.0, 90.0],
        [0.0, 0.0, 180.0, 120.0],
        [40.0, 16.0, 47.0, 23.0],      # 1x1-cell bins replicated
    ], np.float32)
    mask = np.ones((1, 3), bool)
    g = rng.randn(1, 3, 7, 7, c).astype(np.float32)

    d_pal = jax.grad(lambda f: jnp.vdot(
        rp.roi_pool_tpu(f, jnp.array(rois)[None], jnp.array(mask), 0.125),
        jnp.array(g)))(jnp.array(feat))

    # numpy CUDA-semantics backward
    want = np.zeros_like(feat)
    scale = 0.125
    for r in range(3):
        cells = np.floor(rois[r] * scale + 0.5).astype(np.int64)
        x1, y1, x2, y2 = cells
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        for ph in range(7):
            for pw in range(7):
                hs = min(max(ph * rh // 7 + y1, 0), h)
                he = min(max(-(-(ph + 1) * rh // 7) + y1, 0), h)
                ws = min(max(pw * rw // 7 + x1, 0), w)
                we = min(max(-(-(pw + 1) * rw // 7) + x1, 0), w)
                if hs >= he or ws >= we:
                    continue
                for ch in range(c):
                    maxval, my, mx = -np.inf, -1, -1
                    for y in range(hs, he):
                        for x in range(ws, we):
                            if feat[0, y, x, ch] > maxval:
                                maxval, my, mx = feat[0, y, x, ch], y, x
                    want[0, my, mx, ch] += g[0, r, ph, pw, ch]
    np.testing.assert_allclose(np.asarray(d_pal), want, atol=1e-5,
                               rtol=1e-5)
