"""RoI Align (bilinear average pooling).

Reference: wetectron/csrc/cuda/ROIAlign_cuda.cu:78-100 (legacy maskrcnn-
benchmark variant: no -0.5 pixel shift). Selectable via
``POOLER_METHOD: ROIAlign`` (the shipped WSOD configs use ROIPool).

``sampling_ratio == 0`` follows the CUDA kernel's adaptive grid:
``ceil(roi_size / pooled)`` samples per bin per axis, computed per roi
(ROIAlign_cuda.cu:85-88). Static shapes demand a cap: SMAX samples per axis
are generated and samples beyond the per-roi count are masked out of the
average — bit-matching the CUDA grid for every roi up to SMAX*pooled cells
(= 7*16 = 112 cells = 1792 px at stride 16); larger rois clip the grid to
SMAX (documented residual cap, beyond the reference's eval image sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SMAX = 16  # adaptive sampling cap per axis (ceil(roi/pooled) <= SMAX)


def _roi_align_one(feat: jnp.ndarray, roi: jnp.ndarray, valid: jnp.ndarray,
                   spatial_scale: float, pooled: int, sampling: int) -> jnp.ndarray:
    h, w, _ = feat.shape
    roi_start_w = roi[0] * spatial_scale
    roi_start_h = roi[1] * spatial_scale
    roi_end_w = roi[2] * spatial_scale
    roi_end_h = roi[3] * spatial_scale

    roi_w = jnp.maximum(roi_end_w - roi_start_w, 1.0)
    roi_h = jnp.maximum(roi_end_h - roi_start_h, 1.0)
    bin_h = roi_h / pooled
    bin_w = roi_w / pooled

    if sampling > 0:
        s = sampling
        n_h = jnp.asarray(s, jnp.float32)
        n_w = jnp.asarray(s, jnp.float32)
    else:
        # CUDA adaptive grid: ceil(roi_size / pooled) per axis (:85-88)
        s = SMAX
        n_h = jnp.clip(jnp.ceil(bin_h), 1.0, s)
        n_w = jnp.clip(jnp.ceil(bin_w), 1.0, s)

    ph = jnp.arange(pooled, dtype=jnp.float32)
    iy = jnp.arange(s, dtype=jnp.float32)
    # sample centers: start + ph*bin + (i + .5) * bin/n
    ys = roi_start_h + ph[:, None] * bin_h + (iy[None, :] + 0.5) * bin_h / n_h
    xs = roi_start_w + ph[:, None] * bin_w + (iy[None, :] + 0.5) * bin_w / n_w
    my = iy[None, :] < n_h   # [1, s] samples actually in the grid
    mx = iy[None, :] < n_w

    def bilinear(y, x):
        # outside -> 0 (ROIAlign_cuda.cu bilinear_interpolate bounds check)
        oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
        y = jnp.clip(y, 0.0, None)
        x = jnp.clip(x, 0.0, None)
        y0 = jnp.minimum(y.astype(jnp.int32), h - 1)
        x0 = jnp.minimum(x.astype(jnp.int32), w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        ly = jnp.where(y0 >= h - 1, 0.0, y - y0)
        lx = jnp.where(x0 >= w - 1, 0.0, x - x0)
        hy, hx = 1.0 - ly, 1.0 - lx
        v = (hy * hx)[..., None] * feat[y0, x0] + (hy * lx)[..., None] * feat[y0, x1] \
            + (ly * hx)[..., None] * feat[y1, x0] + (ly * lx)[..., None] * feat[y1, x1]
        return jnp.where(oob[..., None], 0.0, v)

    # [pooled, S, pooled, S, C]
    vals = bilinear(ys[:, :, None, None], xs[None, None, :, :])
    keep = (my[:, :, None, None] & mx[None, None, :, :])[..., None]
    out = jnp.sum(jnp.where(keep, vals, 0.0), axis=(1, 3)) / (n_h * n_w)
    return jnp.where(valid, out, jnp.zeros_like(out))


@functools.partial(jax.jit, static_argnames=("spatial_scale", "pooled",
                                             "sampling", "chunk"))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, roi_mask: jnp.ndarray,
              spatial_scale: float, pooled: int = 7, sampling: int = 0,
              chunk: int = 64) -> jnp.ndarray:
    """feat [B,H,W,C], rois [B,P,4], roi_mask [B,P] -> [B,P,pooled,pooled,C].

    Rois are processed in lax.scan chunks so the [.., pooled, S, pooled, S, C]
    sample tensor stays bounded (SMAX=16 grids are 64x the fixed-2 grid)."""
    b, p = rois.shape[:2]
    fn = jax.vmap(jax.vmap(_roi_align_one, in_axes=(None, 0, 0, None, None, None)),
                  in_axes=(0, 0, 0, None, None, None))
    if p <= chunk:
        return fn(feat, rois, roi_mask, spatial_scale, pooled, sampling)

    pad = (-p) % chunk
    rois_p = jnp.pad(rois, ((0, 0), (0, pad), (0, 0)))
    mask_p = jnp.pad(roi_mask, ((0, 0), (0, pad)))
    nch = (p + pad) // chunk

    @jax.checkpoint
    def body_fn(r, m):
        return fn(feat, r, m, spatial_scale, pooled, sampling)

    def body(_, i):
        r = jax.lax.dynamic_slice_in_dim(rois_p, i * chunk, chunk, axis=1)
        m = jax.lax.dynamic_slice_in_dim(mask_p, i * chunk, chunk, axis=1)
        return None, body_fn(r, m)

    _, outs = jax.lax.scan(body, None, jnp.arange(nch))
    outs = jnp.transpose(outs, (1, 0, 2, 3, 4, 5))
    outs = outs.reshape(b, nch * chunk, *outs.shape[3:])
    return outs[:, :p]
