"""CAM-attention proposal generation — the FASTER_RCNN=True path.

TPU-native equivalent of the reference's CAM-hacked RPN
(wetectron/modeling/rpn/rpn.py:154-190 + anchor_generator.py): dense
anchors over the stride-8 feature grid are scored by the attention map
(the reference RoI-pools the per-image mean attention logit over each
anchor and sigmoids it, rpn.py:184), small anchors are dropped
(remove_small_boxes(20), rpn.py:182), and greedy NMS at 0.7 keeps the
top proposals (boxlist_nms max_proposals=2000, rpn.py:186).

Static-shape redesign: the box-mean of the attention logit is computed
EXACTLY for every anchor via a 2-D integral image (one gather of 4
corners per anchor — the reference's 7x7 ROIAlign-mean is itself an
approximation of this box mean); a pre-NMS top-k (default 2048) bounds
the masked O(P^2) NMS; the result is padded to a fixed proposal count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_mask

TO_REMOVE = 1.0  # reference box-width convention


@functools.lru_cache(maxsize=8)
def _anchors(fh: int, fw: int, stride: int,
             sizes=(32, 64, 128, 256, 512),
             ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """[fh*fw*A, 4] xyxy anchors, cell-centered (anchor_generator.py
    grid_anchors semantics: base anchors shifted by stride steps)."""
    base = []
    for s in sizes:
        for r in ratios:
            w = s * np.sqrt(1.0 / r)
            h = s * np.sqrt(r)
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(base, np.float32)                    # [A, 4]
    cy = (np.arange(fh, dtype=np.float32) + 0.5) * stride
    cx = (np.arange(fw, dtype=np.float32) + 0.5) * stride
    shifts = np.stack(np.broadcast_arrays(
        cx[None, :, None], cy[:, None, None]), -1).reshape(-1, 1, 2)
    ctr = np.concatenate([shifts, shifts], -1)             # [fh*fw, 1, 4]
    return (ctr + base[None]).reshape(-1, 4)


def cam_to_proposals(atten: jnp.ndarray, image_sizes: jnp.ndarray,
                     stride: int, out_p: int = 512, pre_nms: int = 2048,
                     nms_thresh: float = 0.7, min_size: float = 20.0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """atten [B, fh, fw] (mean attention logit), image_sizes [B, 2] (h, w)
    -> (boxes [B, out_p, 4], mask [B, out_p], objectness [B, out_p])."""
    b, fh, fw = atten.shape
    anchors = jnp.asarray(_anchors(fh, fw, stride))        # [N, 4]
    n = anchors.shape[0]

    # clip to image (per image) and validity
    hw = image_sizes.astype(jnp.float32)                   # (h, w)
    x1 = jnp.clip(anchors[None, :, 0], 0, hw[:, 1:2] - 1)
    y1 = jnp.clip(anchors[None, :, 1], 0, hw[:, 0:1] - 1)
    x2 = jnp.clip(anchors[None, :, 2], 0, hw[:, 1:2] - 1)
    y2 = jnp.clip(anchors[None, :, 3], 0, hw[:, 0:1] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], -1)                # [B, N, 4]
    valid = ((x2 - x1 + TO_REMOVE) >= min_size) & \
            ((y2 - y1 + TO_REMOVE) >= min_size)

    # exact box-mean of atten via integral image (the pooled-objectness
    # of rpn.py:184, computed exactly instead of via a 7x7 sampling grid)
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(atten.astype(jnp.float32), 1), 2),
                 ((0, 0), (1, 0), (1, 0)))                 # [B, fh+1, fw+1]
    cx1 = jnp.clip(jnp.floor(boxes[..., 0] / stride), 0, fw - 1).astype(jnp.int32)
    cy1 = jnp.clip(jnp.floor(boxes[..., 1] / stride), 0, fh - 1).astype(jnp.int32)
    cx2 = jnp.clip(jnp.ceil((boxes[..., 2] + 1) / stride), cx1 + 1, fw).astype(jnp.int32)
    cy2 = jnp.clip(jnp.ceil((boxes[..., 3] + 1) / stride), cy1 + 1, fh).astype(jnp.int32)

    def gather(img_ii, yy, xx):
        return img_ii[yy, xx]

    g = jax.vmap(gather)
    total = (g(ii, cy2, cx2) - g(ii, cy1, cx2)
             - g(ii, cy2, cx1) + g(ii, cy1, cx1))
    area = ((cy2 - cy1) * (cx2 - cx1)).astype(jnp.float32)
    obj = jax.nn.sigmoid(total / jnp.maximum(area, 1.0))   # [B, N]
    obj = jnp.where(valid, obj, -1.0)

    # pre-NMS top-k, then masked greedy NMS, then top out_p
    k = min(pre_nms, n)
    top_obj, top_idx = jax.lax.top_k(obj, k)               # [B, k]
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_valid = top_obj > 0

    keep = jax.vmap(lambda bx, sc, mk: nms_mask(bx, sc, mk, nms_thresh))(
        top_boxes, top_obj, top_valid)                     # [B, k]
    sel_score = jnp.where(keep, top_obj, -1.0)
    out_score, sel = jax.lax.top_k(sel_score, min(out_p, k))  # [B, out_p]
    out_boxes = jnp.take_along_axis(top_boxes, sel[..., None], axis=1)
    out_mask = out_score > 0
    if out_p > k:
        pad = out_p - k
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_score = jnp.pad(out_score, ((0, 0), (0, pad)), constant_values=-1)
        out_mask = jnp.pad(out_mask, ((0, 0), (0, pad)))
    return out_boxes, out_mask, jnp.where(out_mask, out_score, 0.0)
