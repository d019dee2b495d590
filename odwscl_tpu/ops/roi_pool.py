"""RoI max-pooling with the reference CUDA kernel's exact semantics.

Reference: wetectron/csrc/cuda/ROIPool_cuda.cu:16-77 — the pooler used by
every shipped config (``POOLER_METHOD: "ROIPool"``). Semantics reproduced:

- roi edges are scaled then rounded half-away-from-zero: ``round(x * scale)``
  (coords are non-negative, so this is ``floor(x*scale + 0.5)``)
- malformed rois are forced to 1x1 (``max(end - start + 1, 1)``)
- bin (ph, pw) covers rows ``[floor(ph*bh), ceil((ph+1)*bh))`` offset by
  roi_start and clipped to the feature map
- empty bins output 0

TPU design: the reference launches one CUDA thread per output element, each
scanning its bin — fine on a GPU, hostile to XLA. Here each roi instead
dynamic-slices a fixed-size window ``[WIN, WIN, C]`` out of the feature map
(static shape) and reduces it separably: a masked max over rows into the 7
row-bins, then a masked max over columns into the 7 col-bins. Exact whenever
the roi spans <= WIN feature cells per axis (WIN=32 covers rois up to 256 px
at stride 8); larger rois are sampled with an integer stride, a documented
approximation that only touches near-image-sized proposals. vmapped over
rois and images, jit/grad-friendly (gradients flow as scatter-max VJPs via
XLA autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    # C round() for non-negative inputs (jnp.round is half-to-even).
    return jnp.floor(x + 0.5)


def _bin_edges(start: jnp.ndarray, length: jnp.ndarray, pooled: int, limit: int):
    """Per-bin [lo, hi) cell ranges, offset and clipped (ROIPool_cuda.cu:43-56).

    Integer-exact floor/ceil (== CUDA's correctly-rounded f32 for integer
    roi sizes; XLA fast-math division is off-by-one at exact multiples)."""
    ph = jnp.arange(pooled, dtype=jnp.int32)
    li = length.astype(jnp.int32)
    lo = (ph * li) // pooled + start
    hi = ((ph + 1) * li + (pooled - 1)) // pooled + start
    lo = jnp.clip(lo, 0, limit)
    hi = jnp.clip(hi, 0, limit)
    return lo, hi


def _roi_pool_one(feat: jnp.ndarray, roi: jnp.ndarray, valid: jnp.ndarray,
                  spatial_scale: float, pooled: int, win: int) -> jnp.ndarray:
    """Pool one roi from feat [H, W, C] -> [pooled, pooled, C]."""
    h, w, c = feat.shape
    x1 = _round_half_up(roi[0] * spatial_scale).astype(jnp.int32)
    y1 = _round_half_up(roi[1] * spatial_scale).astype(jnp.int32)
    x2 = _round_half_up(roi[2] * spatial_scale).astype(jnp.int32)
    y2 = _round_half_up(roi[3] * spatial_scale).astype(jnp.int32)

    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    # Integer subsample stride; 1 (exact) unless the roi exceeds the window.
    stride_h = (roi_h + win - 1) // win
    stride_w = (roi_w + win - 1) // win

    # Window of cells actually inspected: rows y1 + k*stride_h, k < win.
    row_ids = y1 + jnp.arange(win, dtype=jnp.int32) * stride_h
    col_ids = x1 + jnp.arange(win, dtype=jnp.int32) * stride_w
    row_ok = (row_ids <= y2) & (row_ids >= 0) & (row_ids < h)
    col_ok = (col_ids <= x2) & (col_ids >= 0) & (col_ids < w)

    # one flat gather [win, win, C]; a row-then-col gather would materialize
    # [win, W, C] per roi (90 GB at eval shapes — observed OOM on v5e)
    flat = feat.reshape(h * w, feat.shape[-1])
    idx2d = (jnp.clip(row_ids, 0, h - 1)[:, None] * w
             + jnp.clip(col_ids, 0, w - 1)[None, :])
    window = flat[idx2d.reshape(-1)].reshape(win, win, feat.shape[-1])

    # Bin ranges in cell coordinates, then mapped onto window sample indices.
    h_lo, h_hi = _bin_edges(y1, roi_h, pooled, h)
    w_lo, w_hi = _bin_edges(x1, roi_w, pooled, w)

    # membership of window sample k in bin ph: h_lo <= row_ids[k] < h_hi
    row_in = (row_ids[None, :] >= h_lo[:, None]) & (row_ids[None, :] < h_hi[:, None]) & row_ok[None, :]
    col_in = (col_ids[None, :] >= w_lo[:, None]) & (col_ids[None, :] < w_hi[:, None]) & col_ok[None, :]

    neg = jnp.asarray(-jnp.finfo(jnp.float32).max, window.dtype)
    # rows: [pooled, win, C] masked max over window rows
    rowmax = jnp.max(
        jnp.where(row_in[:, :, None, None], window[None, :, :, :], neg), axis=1)
    out = jnp.max(
        jnp.where(col_in[None, :, :, None], rowmax[:, None, :, :], neg), axis=2)

    # Empty bins (or invalid rois) pool to exactly 0 (ROIPool_cuda.cu:57-60).
    empty = (~jnp.any(row_in, axis=1)[:, None] | ~jnp.any(col_in, axis=1)[None, :])
    out = jnp.where(empty[:, :, None] | ~valid, jnp.zeros_like(out), out)
    return out


@functools.partial(jax.jit,
                   static_argnames=("spatial_scale", "pooled", "win", "chunk"))
def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, roi_mask: jnp.ndarray,
             spatial_scale: float, pooled: int = 7, win: int = 32,
             chunk: int = 128) -> jnp.ndarray:
    """Batched RoI max pooling.

    feat: [B, H, W, C]; rois: [B, P, 4] xyxy in image coords;
    roi_mask: [B, P] bool. Returns [B, P, pooled, pooled, C].

    Proposals are processed in chunks via lax.scan so the gathered windows
    ([B, chunk, win, win, C]) bound live memory instead of materializing all
    P at once (which would be ~17 GB at eval shapes).
    """
    b, p = rois.shape[:2]
    fn = jax.vmap(jax.vmap(_roi_pool_one, in_axes=(None, 0, 0, None, None, None)),
                  in_axes=(0, 0, 0, None, None, None))
    if p <= chunk:
        return fn(feat, rois, roi_mask, spatial_scale, pooled, win)

    pad = (-p) % chunk
    rois_p = jnp.pad(rois, ((0, 0), (0, pad), (0, 0)))
    mask_p = jnp.pad(roi_mask, ((0, 0), (0, pad)))
    nch = (p + pad) // chunk

    # remat: without it the scan saves each chunk's gathered windows as
    # residuals for the backward pass (observed 120 GB allocation); with it
    # the windows are recomputed chunk-by-chunk in the VJP.
    @jax.checkpoint
    def body_fn(r, m):
        return fn(feat, r, m, spatial_scale, pooled, win)

    def body(_, i):
        r = jax.lax.dynamic_slice_in_dim(rois_p, i * chunk, chunk, axis=1)
        m = jax.lax.dynamic_slice_in_dim(mask_p, i * chunk, chunk, axis=1)
        return None, body_fn(r, m)

    _, outs = jax.lax.scan(body, None, jnp.arange(nch))
    # [nch, B, chunk, r, r, C] -> [B, P, r, r, C]
    outs = jnp.transpose(outs, (1, 0, 2, 3, 4, 5))
    outs = outs.reshape(b, nch * chunk, *outs.shape[3:])
    return outs[:, :p]


def roi_pool_numpy(feat: np.ndarray, rois: np.ndarray, spatial_scale: float,
                   pooled: int = 7) -> np.ndarray:
    """Golden host implementation, literal transcription of the CUDA math.

    feat: [H, W, C]; rois: [P, 4]. Exact for any roi size (no window cap).
    """
    h, w, c = feat.shape
    p = rois.shape[0]
    out = np.zeros((p, pooled, pooled, c), dtype=feat.dtype)
    for n in range(p):
        x1 = int(np.floor(rois[n, 0] * spatial_scale + 0.5))
        y1 = int(np.floor(rois[n, 1] * spatial_scale + 0.5))
        x2 = int(np.floor(rois[n, 2] * spatial_scale + 0.5))
        y2 = int(np.floor(rois[n, 3] * spatial_scale + 0.5))
        roi_w = max(x2 - x1 + 1, 1)
        roi_h = max(y2 - y1 + 1, 1)
        # integer-exact bin edges == CUDA's correctly-rounded f32 arithmetic
        for ph in range(pooled):
            for pw in range(pooled):
                hs = min(max(ph * roi_h // pooled + y1, 0), h)
                he = min(max(-((ph + 1) * roi_h // -pooled) + y1, 0), h)
                ws = min(max(pw * roi_w // pooled + x1, 0), w)
                we = min(max(-((pw + 1) * roi_w // -pooled) + x1, 0), w)
                if he <= hs or we <= ws:
                    out[n, ph, pw] = 0.0
                else:
                    out[n, ph, pw] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out
