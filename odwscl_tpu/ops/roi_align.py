"""RoI Align (bilinear average pooling).

Reference: wetectron/csrc/cuda/ROIAlign_cuda.cu:78-100 (legacy maskrcnn-
benchmark variant: no -0.5 pixel shift). Needed for the ResNet-C5 configs;
the VGG WSOD configs use ROIPool. Implemented as a static bilinear sample
grid + mean — pure gathers that XLA fuses; autodiff gives the scatter-add
backward for free.

Deviation: the CUDA kernel picks ``ceil(roi_size / pooled)`` samples per bin
when ``sampling_ratio == 0`` (data-dependent). We use a static grid
(``sampling_ratio`` if > 0 else 2), which is the common fixed setting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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

    ph = jnp.arange(pooled, dtype=jnp.float32)
    iy = jnp.arange(sampling, dtype=jnp.float32)
    # sample centers: start + ph*bin + (i + .5) * bin/sampling
    ys = roi_start_h + ph[:, None] * bin_h + (iy[None, :] + 0.5) * bin_h / sampling
    xs = roi_start_w + ph[:, None] * bin_w + (iy[None, :] + 0.5) * bin_w / sampling

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
    out = vals.mean(axis=(1, 3))
    return jnp.where(valid, out, jnp.zeros_like(out))


@functools.partial(jax.jit, static_argnames=("spatial_scale", "pooled", "sampling"))
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, roi_mask: jnp.ndarray,
              spatial_scale: float, pooled: int = 7, sampling: int = 2) -> jnp.ndarray:
    """feat [B,H,W,C], rois [B,P,4], roi_mask [B,P] -> [B,P,pooled,pooled,C]."""
    fn = jax.vmap(jax.vmap(_roi_align_one, in_axes=(None, 0, 0, None, None, None)),
                  in_axes=(0, 0, 0, None, None, None))
    return fn(feat, rois, roi_mask, spatial_scale, pooled, sampling)
