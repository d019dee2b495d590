"""Train-time pseudo-GT quality diagnostics.

Reference: wetectron/utils/utils.py:71-118 (cal_precision_recall) — per
(image, class) precision/recall of the mined pseudo-GT boxes against real
GT at IoU thresholds {0.25, 0.5, 0.75}. The reference keeps the helper
unwired (no call site in modeling/); here it is a standalone utility for
dataset-with-GT debugging runs, batched over padded masks.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from ..structures.boxes import box_iou


def pgt_precision_recall(pgt_boxes: jnp.ndarray, pgt_mask: jnp.ndarray,
                         gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                         thresholds: Sequence[float] = (0.25, 0.5, 0.75)
                         ) -> Dict[str, jnp.ndarray]:
    """pgt_boxes [B, N, 4] + mask, gt_boxes [B, G, 4] + mask ->
    {prec_T, rec_T} scalars averaged over images.

    Per image (utils.py:80-94): tp = number of (gt, pgt) pairs with
    IoU > T; fn = number of GT boxes matched by no pgt;
    precision = tp / |pgt|, recall = tp / (tp + fn).
    """
    iou = box_iou(gt_boxes, pgt_boxes)                      # [B, G, N]
    pair_valid = gt_mask[:, :, None] & pgt_mask[:, None, :]
    out: Dict[str, jnp.ndarray] = {}
    n_pgt = pgt_mask.sum(axis=1).astype(jnp.float32)
    any_img = (n_pgt > 0) & (gt_mask.sum(axis=1) > 0)
    denom_img = jnp.clip(jnp.where(any_img, 1.0, 0.0).sum(), 1.0)
    for t in thresholds:
        hit = (iou > t) & pair_valid                        # [B, G, N]
        tp = hit.sum(axis=(1, 2)).astype(jnp.float32)       # pair count
        matched_gt = jnp.any(hit, axis=2)                   # [B, G]
        fn = (gt_mask & ~matched_gt).sum(axis=1).astype(jnp.float32)
        prec = jnp.where(any_img, tp / jnp.clip(n_pgt, 1.0), 0.0)
        rec = jnp.where(any_img, tp / jnp.clip(tp + fn, 1.0), 0.0)
        out[f"pgt_prec_{t:.2f}"] = prec.sum() / denom_img
        out[f"pgt_rec_{t:.2f}"] = rec.sum() / denom_img
    return out
