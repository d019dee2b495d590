"""Partial-label supervision: refine pseudo labels with clicks/scribbles.

Reference: loss.py:208-231 (filter_pseudo_labels) + weak_head/roi_sampler.py
— active when ``MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS`` is 'point' or
'scribble' with ``ROI_LOSS_REFINE: True``. Batched/masked version: clicks
and scribble boxes come in padded per-image tensors.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..structures.boxes import box_iou_async
from ..models.matcher import match_proposals


def filter_pseudo_labels_point(pseudo_labels: jnp.ndarray, boxes: jnp.ndarray,
                               clicks: jnp.ndarray, click_labels: jnp.ndarray,
                               click_mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out pseudo labels not supported by any same-class click inside
    the proposal (loss.py:219-229).

    pseudo_labels [B,P] int; boxes [B,P,4]; clicks [B,K,2] (x,y);
    click_labels [B,K] int; click_mask [B,K].
    """
    x, y = clicks[..., 0], clicks[..., 1]
    inside = ((x[:, :, None] > boxes[:, None, :, 0])
              & (y[:, :, None] > boxes[:, None, :, 1])
              & (x[:, :, None] < boxes[:, None, :, 2])
              & (y[:, :, None] < boxes[:, None, :, 3])
              & click_mask[:, :, None])                     # [B, K, P]
    same_cls = (click_labels[:, :, None] == pseudo_labels[:, None, :])
    supported = jnp.any(inside & same_cls, axis=1)          # [B, P]
    return jnp.where(supported, pseudo_labels, 0)


def filter_pseudo_labels_scribble(pseudo_labels: jnp.ndarray,
                                  boxes: jnp.ndarray,
                                  scribbles: jnp.ndarray,
                                  scribble_labels: jnp.ndarray,
                                  scribble_mask: jnp.ndarray) -> jnp.ndarray:
    """Scribble variant (loss.py:210-217): match proposals to scribble boxes
    by asymmetric IoU (intersection / scribble area) at 0.5; zero pseudo
    labels that are unmatched or disagree with the matched scribble's class.

    scribbles [B,S,4]; scribble_labels [B,S]; scribble_mask [B,S].
    """
    import jax

    def per_image(pl, bx, sc, sl, sm):
        quality = box_iou_async(sc, bx)                     # [S, P]
        matched = match_proposals(quality, sm, 0.5, 0.5, False)
        unmatched = matched < 0
        matched_cls = sl[jnp.clip(matched, 0)]
        keep = (~unmatched) & (matched_cls == pl)
        return jnp.where(keep, pl, 0)

    return jax.vmap(per_image)(pseudo_labels, boxes, scribbles,
                               scribble_labels, scribble_mask)
