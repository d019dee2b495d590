"""On-device antialiased image resize for the TTA serving fast path.

The reference's TTA eval resizes the ORIGINAL PIL image once per (scale,
flip) transform on host (wetectron/engine/bbox_aug.py:27-35 building
T.Resize per scale; data/transforms/transforms.py Resize.__call__ uses
PIL BILINEAR), then ships every resized copy to the device. On a
bandwidth-constrained host->device link the image uploads — not device
compute — bound the whole eval loop (measured in tools/bench_eval_e2e.py:
~350 MB/batch across 7 scales vs ~50 MB for the base scale alone).

This module derives the TTA scales ON DEVICE instead: upload the original
(normalized) image once, then build each scale with PIL.BILINEAR-convention
antialiased triangle-filter resampling expressed as TWO MATMULS —
``out = R_h @ img @ R_w^T`` with the weight matrices computed in-graph
from the per-image source/target sizes (dynamic scalars, static padded
shapes), so one compiled kernel serves every image geometry in a padded
batch and the MXU does the resampling.

PIL convention reproduced (Pillow src/libImaging/Resample.c):
  - center of output pixel i sits at (i + 0.5) * (in/out) in input coords
  - filter scale fs = max(1, in/out): minification widens the triangle
    support (antialiasing); magnification keeps the classic 2-tap bilinear
  - weight for input pixel j: max(0, 1 - |j + 0.5 - center| / fs)
  - taps outside the valid range are dropped and the remainder
    renormalized (PIL clips the window to the image and normalizes)

Deviation from the host path (documented, tests/test_device_resize.py):
PIL resamples the uint8 image with fixed-point rounding BEFORE
normalization; here the resample runs in f32 on normalized pixels.
Identical up to uint8 rounding: |device - host| <= ~1.0 in BGR-255 units
per pixel. Against PIL's own float ('F' mode) resize the kernel matches to
float tolerance. Normalization commutes with the resample exactly (the
weights sum to 1, so affine per-channel maps pass through).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def triangle_weights(out_pad: int, in_pad: int, valid_in, valid_out
                     ) -> jnp.ndarray:
    """[out_pad, in_pad] PIL-BILINEAR resampling matrix for one axis.

    ``valid_in`` / ``valid_out`` are dynamic scalars (the unpadded source
    and target lengths); rows >= valid_out and columns >= valid_in are
    zero, so padded canvas regions stay zero.
    """
    valid_in = jnp.asarray(valid_in, jnp.float32)
    valid_out = jnp.asarray(valid_out, jnp.float32)
    scale = valid_in / jnp.maximum(valid_out, 1.0)
    fs = jnp.maximum(scale, 1.0)
    i = jnp.arange(out_pad, dtype=jnp.float32)[:, None]
    j = jnp.arange(in_pad, dtype=jnp.float32)[None, :]
    center = (i + 0.5) * scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j + 0.5 - center) / fs)
    w = jnp.where(j < valid_in, w, 0.0)
    w = jnp.where(i < valid_out, w, 0.0)
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("out_hw",))
def resize_image_batch(images: jnp.ndarray, in_sizes: jnp.ndarray,
                       out_sizes: jnp.ndarray, out_hw: Tuple[int, int]
                       ) -> jnp.ndarray:
    """Resize each image's valid region to its target size, on device.

    images:    [B, H0, W0, C] (any float dtype; padding must be zero)
    in_sizes:  [B, 2] (h, w) valid source extents
    out_sizes: [B, 2] (h, w) per-image targets
    out_hw:    static padded output canvas (H1, W1)

    Returns [B, H1, W1, C] in images.dtype; region beyond each target size
    is zero (the collate padding convention).
    """
    h1, w1 = out_hw
    h0, w0 = images.shape[1:3]

    def one(img, isz, osz):
        ry = triangle_weights(h1, h0, isz[0], osz[0])
        rx = triangle_weights(w1, w0, isz[1], osz[1])
        t = jnp.einsum("oh,hwc->owc", ry, img.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return jnp.einsum("pw,owc->opc", rx, t,
                          preferred_element_type=jnp.float32)

    out = jax.vmap(one)(images, jnp.asarray(in_sizes, jnp.float32),
                        jnp.asarray(out_sizes, jnp.float32))
    return out.astype(images.dtype)


@jax.jit
def scale_boxes_batch(boxes: jnp.ndarray, in_sizes: jnp.ndarray,
                      out_sizes: jnp.ndarray) -> jnp.ndarray:
    """Per-image box rescale, matching the host resize (transforms.py
    resize(): x *= ow/w, y *= oh/h). boxes [B, P, 4] xyxy;
    sizes [B, 2] (h, w)."""
    r = (jnp.asarray(out_sizes, jnp.float32)
         / jnp.maximum(jnp.asarray(in_sizes, jnp.float32), 1.0))
    rh, rw = r[:, 0:1], r[:, 1:2]
    return jnp.stack([boxes[..., 0] * rw, boxes[..., 1] * rh,
                      boxes[..., 2] * rw, boxes[..., 3] * rh], axis=-1)
