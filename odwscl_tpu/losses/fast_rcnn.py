"""Fully-supervised Fast R-CNN box-head loss (the strong-supervision path).

Reference: wetectron/modeling/roi_heads/box_head/loss.py:15-175
(FastRCNNLossComputation + make_roi_box_loss_evaluator). Batched/masked
redesign: instead of per-image index lists, everything is computed over the
padded [B, P] proposal grid with sampled-proposal masks; the loss
normalizations reproduce the reference's cat-over-images semantics exactly
(CE mean over ALL sampled proposals in the batch; box smooth-L1 summed over
positives' class columns / total sampled count, loss.py:148-171).

Matching/sampling reuse the shared Matcher + BalancedPositiveNegativeSampler
equivalents (models/matcher.py), with the same sentinels: below-low -> label
0 (background), between-thresholds -> ignored by the sampler.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.matcher import match_proposals, balanced_sample
from ..ops.losses import smooth_l1_loss
from ..structures.boxes import box_iou, encode_boxes


class FastRCNNTargets(NamedTuple):
    labels: jnp.ndarray       # [B, P] int32 (0 = bg; valid only where sampled)
    reg_targets: jnp.ndarray  # [B, P, 4] encoded vs the matched gt
    pos_mask: jnp.ndarray     # [B, P] sampled positives
    neg_mask: jnp.ndarray     # [B, P] sampled negatives


def prepare_fast_rcnn_targets(
        rng: jax.Array,
        boxes: jnp.ndarray, box_mask: jnp.ndarray,
        gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
        fg_iou: float = 0.5, bg_iou: float = 0.5,
        batch_size_per_image: int = 512, positive_fraction: float = 0.25,
        reg_weights: Tuple[float, float, float, float] = (10., 10., 5., 5.),
        ) -> FastRCNNTargets:
    """prepare_targets + subsample (loss.py:52-119) over padded batches.

    boxes [B,P,4] xyxy proposals, box_mask [B,P]; gt_boxes [B,G,4],
    gt_labels [B,G] int (1..C-1), gt_mask [B,G].
    """
    b = boxes.shape[0]
    rngs = jax.random.split(rng, b)

    def per_image(r, bx, msk, gbx, glb, gmk):
        quality = jnp.where(gmk[:, None] & msk[None, :],
                            box_iou(gbx, bx), 0.0)          # [G, P]
        matched = match_proposals(quality, gmk, fg_iou, bg_iou,
                                  allow_low_quality_matches=False)  # [P]
        safe = jnp.clip(matched, 0)
        labels = jnp.where(matched >= 0, glb[safe].astype(jnp.int32), 0)
        labels = jnp.where(matched == -2, -1, labels)       # ignored
        labels = jnp.where(msk, labels, -1)                 # padding ignored
        reg = encode_boxes(gbx[safe], bx, reg_weights)      # [P, 4]
        pos, neg = balanced_sample(r, labels, labels >= 0,
                                   batch_size_per_image, positive_fraction)
        return labels, reg, pos, neg

    labels, reg, pos, neg = jax.vmap(per_image)(
        rngs, boxes, box_mask, gt_boxes, gt_labels, gt_mask)
    return FastRCNNTargets(labels, reg, pos, neg)


def fast_rcnn_loss(class_logits: jnp.ndarray, box_regression: jnp.ndarray,
                   targets: FastRCNNTargets,
                   cls_agnostic_bbox_reg: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """loss.py:121-171 __call__: (classification_loss, box_loss, accuracy).

    class_logits [B, P, C]; box_regression [B, P, 4C] (or [B, P, 8]
    cls-agnostic: bg cols 0-3, fg cols 4-7).
    """
    c = class_logits.shape[-1]
    labels = targets.labels
    sampled = targets.pos_mask | targets.neg_mask            # [B, P]
    n_sampled = jnp.maximum(sampled.sum(), 1)

    safe_lab = jnp.clip(labels, 0)
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe_lab[..., None], axis=-1)[..., 0]
    cls_loss = jnp.where(sampled, ce, 0.0).sum() / n_sampled

    preds = jnp.argmax(class_logits, axis=-1)
    acc = (jnp.where(sampled, preds == safe_lab, False).sum()
           / n_sampled).astype(jnp.float32)

    if cls_agnostic_bbox_reg:
        col0 = jnp.full_like(safe_lab, 1)                    # cols 4..7
    else:
        col0 = safe_lab                                      # cols 4l..4l+3
    cols = 4 * col0[..., None] + jnp.arange(4)               # [B, P, 4]
    reg_pred = jnp.take_along_axis(
        box_regression.astype(jnp.float32), cols, axis=-1)
    per_box = smooth_l1_loss(reg_pred, targets.reg_targets, beta=1.0)
    box_loss = (jnp.where(targets.pos_mask[..., None], per_box, 0.0).sum()
                / n_sampled)
    return cls_loss, box_loss, acc
