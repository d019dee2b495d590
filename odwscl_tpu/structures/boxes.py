"""Static-shape box containers and geometry ops.

The reference carries ragged per-image ``BoxList`` objects everywhere
(reference wetectron/structures/bounding_box.py:13) and computes IoU / NMS /
encode-decode with the Detectron "+1" pixel convention
(boxlist_ops.py:154-159, box_coder.py:32). On TPU everything must be
statically shaped, so the rebuild's core container is :class:`Boxes`: a
``[..., P, 4]`` xyxy array padded to a bucket size with a ``[..., P]``
validity mask. All ops below are pure jnp, vmap/jit-friendly, and keep the
exact +1 conventions so pseudo-label assignment and eval match the reference
bit-for-bit (padding aside).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import struct

TO_REMOVE = 1.0  # Detectron pixel convention: width = x2 - x1 + 1
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


@struct.dataclass
class Boxes:
    """Padded xyxy boxes with a validity mask.

    boxes: float32 [..., P, 4]
    mask:  bool    [..., P] — True for real boxes, False for padding.
    """

    boxes: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_boxes(self) -> jnp.ndarray:
        return self.mask.sum(axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the +1 convention (reference bounding_box.py `area`)."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, +1 convention (reference boxlist_ops.py:127-160).

    boxes1: [..., N, 4], boxes2: [..., M, 4] -> [..., N, M]
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[..., :, None] + area2[..., None, :] - inter)


def box_iou_async(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over area of boxes1 (reference boxlist_ops.py:202-233)."""
    area1 = box_area(boxes1)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[..., :, None] + 1e-10)


def masked_iou(boxes1: jnp.ndarray, mask1: jnp.ndarray,
               boxes2: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """IoU with invalid pairs zeroed out."""
    iou = box_iou(boxes1, boxes2)
    valid = mask1[..., :, None] & mask2[..., None, :]
    return jnp.where(valid, iou, 0.0)


def clip_to_image(boxes: jnp.ndarray, image_size_hw: jnp.ndarray) -> jnp.ndarray:
    """Clip xyxy boxes to [0, size-1] (reference bounding_box.py clip_to_image).

    image_size_hw broadcasts against boxes' batch dims: its shape must be
    boxes.shape[:-1] + (2,) or prefix-broadcastable to it.
    """
    h = image_size_hw[..., 0]
    w = image_size_hw[..., 1]
    x1 = jnp.clip(boxes[..., 0], 0.0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Mask of boxes whose xywh width AND height >= min_size.

    Matches reference boxlist_ops.py:96-113: conversion to xywh uses
    w = x2 - x1 + 1 (the same +1 convention as `BoxList.convert`).
    """
    ws = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    hs = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (ws >= min_size) & (hs >= min_size)


def flip_boxes_horizontal(boxes: jnp.ndarray, image_width) -> jnp.ndarray:
    """Horizontal flip (reference bounding_box.py transpose(0)):
    new_x1 = W - 1 - x2 ; new_x2 = W - 1 - x1 (TO_REMOVE convention)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    new_x1 = image_width - TO_REMOVE - x2
    new_x2 = image_width - TO_REMOVE - x1
    return jnp.stack([new_x1, y1, new_x2, y2], axis=-1)


def resize_boxes(boxes: jnp.ndarray, ratio_w, ratio_h) -> jnp.ndarray:
    """Scale boxes by independent x/y ratios (reference bounding_box.py resize)."""
    x1 = boxes[..., 0] * ratio_w
    y1 = boxes[..., 1] * ratio_h
    x2 = boxes[..., 2] * ratio_w
    y2 = boxes[..., 3] * ratio_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# ---------------------------------------------------------------------------
# Box coder (reference wetectron/modeling/box_coder.py:7-95)
# ---------------------------------------------------------------------------

def encode_boxes(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
                 weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
                 ) -> jnp.ndarray:
    """Detectron-convention (dx,dy,dw,dh) encoding (box_coder.py:22-50)."""
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    wx, wy, ww, wh = weights
    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(rel_codes: jnp.ndarray, boxes: jnp.ndarray,
                 weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
                 ) -> jnp.ndarray:
    """Decode (box_coder.py:52-95). rel_codes [..., P, 4*K], boxes [..., P, 4]
    -> [..., P, 4*K]; the x2/y2 '-1' asymmetry is intentional in the reference."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    shape = rel_codes.shape
    codes = rel_codes.reshape(shape[:-1] + (-1, 4))  # [..., P, K, 4]
    wx, wy, ww, wh = weights
    dx = codes[..., 0] / wx
    dy = codes[..., 1] / wy
    dw = jnp.minimum(codes[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(codes[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack([
        pred_cx - 0.5 * pred_w,
        pred_cy - 0.5 * pred_h,
        pred_cx + 0.5 * pred_w - 1.0,
        pred_cy + 0.5 * pred_h - 1.0,
    ], axis=-1)
    return out.reshape(shape)
