"""WSDDN/OICR/OD loss terms (batched, masked).

Reference: wetectron/modeling/roi_heads/weak_head/loss.py. These are the
pure tensor-level pieces; the mining + augmented-view orchestration lives in
the detector's train forward (it needs model applies between stages).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.losses import binary_cross_entropy, cross_entropy_with_logits, smooth_l1_loss


def wsddn_final_score(cls_logit: jnp.ndarray, det_logit: jnp.ndarray,
                      box_mask: jnp.ndarray) -> jnp.ndarray:
    """softmax over classes x masked softmax over proposals (loss.py:234-247).

    cls_logit/det_logit: [B, P, C] raw; returns [B, P, C] f32, pads = 0.
    """
    cls = jax.nn.softmax(cls_logit.astype(jnp.float32), axis=-1)
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    det = jnp.where(box_mask[..., None], det_logit.astype(jnp.float32), neg)
    m = jnp.max(det, axis=-2, keepdims=True)
    e = jnp.where(box_mask[..., None], jnp.exp(det - m), 0.0)
    det = e / jnp.clip(e.sum(axis=-2, keepdims=True), 1e-20)
    return cls * det


def mil_loss(final_score: jnp.ndarray, labels_img: jnp.ndarray,
             epsilon: float = 1e-8) -> jnp.ndarray:
    """Image-level MIL BCE (loss.py:353-354).

    final_score [B,P,C]; labels_img [B,C] (col 0 = bg, always 0).
    """
    img_score = jnp.clip(final_score.sum(axis=1), epsilon, 1.0 - epsilon)
    bce = binary_cross_entropy(img_score, jnp.clip(labels_img, 0.0, 1.0))
    return bce.mean(axis=-1).mean()


def refinement_cls_loss(ref_logit: jnp.ndarray, pseudo_labels: jnp.ndarray,
                        weights: jnp.ndarray, box_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-branch weighted CE, masked mean over real proposals (loss.py:375-377).

    ref_logit [B,P,C]; pseudo_labels [B,P] int; weights [B,P]; box_mask [B,P].
    Returns per-image mean, then mean over images (matching the reference's
    per-image accumulation divided by batch size).
    """
    ce = cross_entropy_with_logits(ref_logit.astype(jnp.float32), pseudo_labels)
    w = jax.lax.stop_gradient(weights)
    per = jnp.where(box_mask, ce * w, 0.0)
    denom = jnp.clip(box_mask.sum(axis=-1), 1)
    return (per.sum(axis=-1) / denom).mean()


def refinement_reg_loss(bbox_pred: jnp.ndarray, pseudo_labels: jnp.ndarray,
                        weights: jnp.ndarray, reg_targets: jnp.ndarray,
                        box_mask: jnp.ndarray,
                        cls_agnostic: bool = False) -> jnp.ndarray:
    """Smooth-L1 on positives (loss.py:380-394): per-class box columns,
    weighted by pseudo-label scores, summed and divided by the number of
    real proposals."""
    b, p, _ = bbox_pred.shape
    pred = bbox_pred.astype(jnp.float32).reshape(b, p, -1, 4)
    if cls_agnostic:
        picked = pred[:, :, -1, :]
    else:
        picked = jnp.take_along_axis(
            pred, pseudo_labels[:, :, None, None].astype(jnp.int32).clip(0), axis=2
        )[:, :, 0, :]
    pos = (pseudo_labels > 0) & box_mask
    w = jax.lax.stop_gradient(weights)
    l1 = smooth_l1_loss(picked, jax.lax.stop_gradient(reg_targets), beta=1.0)
    per = jnp.where(pos[..., None], l1 * w[..., None], 0.0)
    denom = jnp.clip(box_mask.sum(axis=-1), 1)
    return (per.sum(axis=(1, 2)) / denom).mean()


def avg_image_accuracy(labels: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """compute_avg_img_accuracy (loss.py:25-33): accuracy of the top-k class
    predictions, k = number of GT classes. labels/scores: [B, C]."""
    c = labels.shape[-1]
    k = jnp.maximum(labels.sum(axis=-1).astype(jnp.int32), 1)  # [B]
    order = jnp.argsort(-scores, axis=-1)
    picked = jnp.take_along_axis(labels, order, axis=-1)  # sorted by score
    rank_ok = jnp.arange(c)[None, :] < k[:, None]
    acc = jnp.where(rank_ok, picked, 0.0).sum(axis=-1) / k
    return acc.mean()


def sum_losses(loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return jnp.sum(jnp.stack(list(loss_dict.values())))
