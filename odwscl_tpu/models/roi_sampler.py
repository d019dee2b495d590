"""Proposal subsampling for partial-label supervision (TPU-native
equivalent of wetectron/modeling/roi_heads/weak_head/roi_sampler.py:16-232,
called from weak_head.py:103-105 when PARTIAL_LABELS != none).

The reference, before feature extraction, (1) assigns each proposal a
class label from the partial annotations (point: first click strictly
inside the box, roi_sampler.py:99-117; scribble: IoU-async vs scribble
boxes through the standard Matcher, :162-176), then (2) draws a balanced
FG/BG subset of ROI_HEADS.BATCH_SIZE_PER_IMAGE proposals
(BalancedPositiveNegativeSampler, 25% positives) and trains only on those,
preserving the original proposal order.

Here the subsample is a static-shape [B, S] gather: selected proposals are
compacted to the front in original order and the tail is masked out — the
downstream pooled/neck tensors shrink from P (2048) to S (512), a 4x
train-compute saving whenever partial labels are active.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import box_iou_async
from .matcher import (BELOW_LOW_QUALITY, BETWEEN_THRESHOLDS, balanced_sample,
                      match_proposals)


def match_labels_point(boxes: jnp.ndarray, clicks: jnp.ndarray,
                       click_labels: jnp.ndarray, click_mask: jnp.ndarray
                       ) -> jnp.ndarray:
    """[B,P,4] boxes, [B,K,2] clicks -> [B,P] int32 labels (0 = bg).

    A proposal matches click k iff the click lies STRICTLY inside the box
    (roi_sampler.py:105-108: diff > 0 / < 0); the first matching click
    wins (float argmax over the K axis, :111). Unmatched -> -1 ->
    background label 0 (:132-133). Point mode produces no ignore labels.
    """
    cx = clicks[:, :, 0][:, :, None]                       # [B,K,1]
    cy = clicks[:, :, 1][:, :, None]
    inside = ((cx > boxes[:, None, :, 0]) & (cy > boxes[:, None, :, 1])
              & (cx < boxes[:, None, :, 2]) & (cy < boxes[:, None, :, 3]))
    inside = inside & click_mask[:, :, None]               # [B,K,P]
    first = jnp.argmax(inside.astype(jnp.float32), axis=1)  # [B,P]
    matched = jnp.any(inside, axis=1)
    lab = jnp.take_along_axis(click_labels, first, axis=1)
    return jnp.where(matched, lab, 0).astype(jnp.int32)


def match_labels_scribble(boxes: jnp.ndarray, scribbles: jnp.ndarray,
                          scribble_labels: jnp.ndarray,
                          scribble_mask: jnp.ndarray,
                          fg_iou: float, bg_iou: float) -> jnp.ndarray:
    """[B,P] int32 labels: class, 0 = bg, -1 = ignore (between thresholds).

    Match quality is iou_async (intersection / scribble area,
    boxlist_ops.py:202) through the standard Matcher with
    allow_low_quality_matches=False (roi_sampler.py:17-22,163-176).
    """
    def one(bx, sc, sl, sm):
        q = box_iou_async(sc, bx)                          # [S, P]
        m = match_proposals(q, sm, fg_iou, bg_iou,
                            allow_low_quality_matches=False)
        lab = jnp.where(m >= 0, sl[jnp.clip(m, 0)], 0)
        lab = jnp.where(m == BELOW_LOW_QUALITY, 0, lab)
        lab = jnp.where(m == BETWEEN_THRESHOLDS, -1, lab)
        return lab.astype(jnp.int32)

    return jax.vmap(one)(boxes, scribbles, scribble_labels, scribble_mask)


def subsample_proposals(rng: jax.Array, boxes: jnp.ndarray,
                        mask: jnp.ndarray, labels: jnp.ndarray,
                        batch_size_per_image: int, positive_fraction: float
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Balanced FG/BG subsample to a static [B, S] proposal set.

    Returns (boxes' [B,S,4], mask' [B,S], idx [B,S] int32 indices into the
    original P axis). Selected proposals keep their original relative
    order (the reference's nonzero(pos|neg) gather, roi_sampler.py:95-99);
    tail slots repeat index 0 with mask False.
    """
    b, p = mask.shape
    s = batch_size_per_image
    rngs = jax.random.split(rng, b)
    pos, neg = jax.vmap(
        lambda r, l, v: balanced_sample(r, l, v, batch_size_per_image,
                                        positive_fraction))(rngs, labels, mask)
    sel = pos | neg                                        # [B, P]
    # stable compaction: selected first, original order preserved
    order = jnp.argsort(~sel, axis=1, stable=True)         # [B, P]
    idx = order[:, :s].astype(jnp.int32)
    new_mask = jnp.take_along_axis(sel, order[:, :s], axis=1)
    idx = jnp.where(new_mask, idx, 0)
    new_boxes = jnp.take_along_axis(boxes, idx[:, :, None], axis=1)
    return new_boxes, new_mask, idx
