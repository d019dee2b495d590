"""Pseudo-label generators (OICR / MIST / OD layers), batched.

Reference: wetectron/modeling/roi_heads/weak_head/pseudo_label_generator.py.
All three layers share the same backend: build a pseudo-GT set (boxes are
always a subset of the proposals), IoU-assign every proposal to its best
pseudo-GT (+1 IoU convention, numpy-argmax first-occurrence tie-break,
pseudo_label_generator.py:52-55,176-177), background below the FG threshold,
loss weight = assigned pseudo-GT's score, regression targets via the
Detectron box coder.

Batched design: pseudo-GT sets are [C-1, P] membership masks compacted to a
fixed number of slots ordered (class asc, score desc) — exactly the order
the reference concatenates them in, so argmax ties resolve identically. The
per-class sequential `_prob[max_index].fill_(0)` row-zeroing (which *does*
leak across classes in the reference) is reproduced with a static scan over
the class axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..structures.boxes import box_iou, encode_boxes


class PseudoLabels(NamedTuple):
    labels: jnp.ndarray       # [B, P] int32; 0 = background
    weights: jnp.ndarray      # [B, P] float32
    reg_targets: jnp.ndarray  # [B, P, 4]
    overflow: jnp.ndarray     # scalar int32: dropped GT candidates


def _sequential_gt_scan(fg_scores: jnp.ndarray, box_mask: jnp.ndarray,
                        labels_fg: jnp.ndarray, pgt_instance: jnp.ndarray | None):
    """The od/oicr per-class loop (pseudo_label_generator.py:149-165).

    fg_scores: [B, P, C-1] source softmax w/o bg; pgt_instance: [B, C-1, P]
    mined sets or None (oicr). Returns gt_mask [B, C-1, P] and gt_score
    [B, C-1, P] (scores read AFTER earlier classes' row-zeroing).
    """
    b, p, c1 = fg_scores.shape
    neg = jnp.asarray(-jnp.inf, fg_scores.dtype)

    gt_masks, gt_scores = [], []
    cur = fg_scores  # [B, P, C-1], rows get zeroed as classes are consumed
    for c in range(c1):
        active = labels_fg[:, c]  # [B]
        col = jnp.where(box_mask, cur[:, :, c], neg)
        mi = jnp.argmax(col, axis=-1)  # [B]
        onehot = jax.nn.one_hot(mi, p, dtype=jnp.bool_)
        if pgt_instance is not None:
            pi = pgt_instance[:, c, :]  # [B, P]
            has = jnp.any(pi, axis=-1, keepdims=True)
            gt_c = jnp.where(has, pi, onehot)
        else:
            gt_c = onehot
        gt_c &= active[:, None] & box_mask
        gt_masks.append(gt_c)
        gt_scores.append(jnp.where(gt_c, cur[:, :, c], 0.0))
        # zero the max row across ALL classes (fill_(0) on the row) — this
        # deliberately leaks into later classes exactly as in the reference.
        zero_row = onehot & active[:, None]
        cur = jnp.where(zero_row[:, :, None], 0.0, cur)

    gt_mask = jnp.stack(gt_masks, axis=1)    # [B, C-1, P]
    gt_score = jnp.stack(gt_scores, axis=1)  # [B, C-1, P]
    return gt_mask, gt_score


def _assign(boxes: jnp.ndarray, box_mask: jnp.ndarray, gt_mask: jnp.ndarray,
            gt_score: jnp.ndarray, fg_iou: float, bg_strict_less: bool,
            gt_cap: int, reg_weights) -> PseudoLabels:
    """Compact GT candidates, IoU-assign proposals, produce labels/weights/
    regression targets (pseudo_label_generator.py:48-72 / 167-191)."""
    b, c1, p = gt_mask.shape

    def per_image(bx, msk, gmask, gscore):
        flat = gmask.reshape(-1)  # (c, p) c-major
        (gflat,) = jnp.nonzero(flat, size=gt_cap, fill_value=-1)
        gvalid = gflat >= 0
        gc = jnp.where(gvalid, gflat // p, 0)
        gp = jnp.where(gvalid, gflat % p, 0)
        gs = gscore.reshape(-1)[jnp.clip(gflat, 0)]

        # order = (class asc, score desc, proposal asc): the reference
        # concatenates per-class NMS outputs, which are score-sorted.
        srank = jnp.sum(
            (gc[None, :] == gc[:, None])
            & ((gs[None, :] > gs[:, None])
               | ((gs[None, :] == gs[:, None]) & (gp[None, :] < gp[:, None])))
            & gvalid[None, :], axis=1)
        key = jnp.where(gvalid, gc * (gt_cap + 1) + srank, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)
        gc, gp, gs, gvalid = gc[order], gp[order], gs[order], gvalid[order]

        gt_boxes = bx[gp]  # [G, 4]
        iou = box_iou(bx, gt_boxes)  # [P, G] (+1 convention)
        iou = jnp.where(gvalid[None, :], iou, -1.0)
        assign = jnp.argmax(iou, axis=-1)      # first max -> reference order
        max_ov = jnp.take_along_axis(iou, assign[:, None], axis=-1)[:, 0]

        any_gt = jnp.any(gvalid)
        fg = (max_ov > fg_iou) if not bg_strict_less else (max_ov >= fg_iou)
        lab = jnp.where(fg & msk & any_gt, gc[assign] + 1, 0).astype(jnp.int32)
        wgt = jnp.where(msk & any_gt, gs[assign], 0.0)
        reg = encode_boxes(gt_boxes[assign], bx, reg_weights)
        reg = jnp.where((msk & any_gt)[:, None], reg, 0.0)

        overflow = jnp.maximum(flat.sum() - gvalid.sum(), 0)
        return lab, wgt, reg, overflow

    lab, wgt, reg, ovf = jax.vmap(per_image)(boxes, box_mask, gt_mask, gt_score)
    return PseudoLabels(lab, wgt, reg, ovf.sum())


def od_layer(boxes: jnp.ndarray, box_mask: jnp.ndarray,
             fg_scores: jnp.ndarray, labels_fg: jnp.ndarray,
             pgt_instance: jnp.ndarray, fg_iou: float = 0.5,
             gt_cap: int = 128,
             reg_weights=(10.0, 10.0, 5.0, 5.0)) -> PseudoLabels:
    """Paper's od_layer (pseudo_label_generator.py:135-197): pseudo-GT sets
    come from the contrastive miner's pgt_instance; empty classes fall back
    to the top-scoring proposal. Background where max IoU <= fg_iou (`le`)."""
    gt_mask, gt_score = _sequential_gt_scan(fg_scores, box_mask, labels_fg,
                                            pgt_instance)
    return _assign(boxes, box_mask, gt_mask, gt_score, fg_iou,
                   bg_strict_less=False, gt_cap=gt_cap, reg_weights=reg_weights)


def oicr_layer(boxes: jnp.ndarray, box_mask: jnp.ndarray,
               fg_scores: jnp.ndarray, labels_fg: jnp.ndarray,
               fg_iou: float = 0.5, gt_cap: int = 32,
               reg_weights=(10.0, 10.0, 5.0, 5.0)) -> PseudoLabels:
    """OICR (pseudo_label_generator.py:83-133): one top box per positive
    class. Background where max IoU <= fg_iou (`le`, line 118)."""
    gt_mask, gt_score = _sequential_gt_scan(fg_scores, box_mask, labels_fg, None)
    return _assign(boxes, box_mask, gt_mask, gt_score, fg_iou,
                   bg_strict_less=False, gt_cap=gt_cap, reg_weights=reg_weights)


def mist_layer(boxes: jnp.ndarray, box_mask: jnp.ndarray,
               fg_scores: jnp.ndarray, labels_fg: jnp.ndarray,
               portion: float = 0.15, iou_div: float = 0.2,
               fg_iou: float = 0.5, gt_cap: int = 512,
               reg_weights=(10.0, 10.0, 5.0, 5.0)) -> PseudoLabels:
    """MIST (pseudo_label_generator.py:14-81): per positive class take the
    top p% proposals, keep a diverse subset (drop any whose IoU to a
    higher-ranked top-k box >= iou_div). Background where max IoU < fg_iou
    (`lt`, line 62 — note: strict, unlike oicr/od)."""
    b, p, c1 = fg_scores.shape
    k = max(int(p * portion), 1)
    neg = jnp.asarray(-jnp.inf, fg_scores.dtype)
    masked = jnp.where(box_mask[:, :, None], fg_scores, neg)  # [B,P,C-1]

    # top-k per class (count of *real* proposals times portion is dynamic;
    # we take k of the padded P and mask ranks beyond the per-image k)
    num_real = box_mask.sum(axis=-1)  # [B]
    k_real = jnp.floor(num_real * portion).astype(jnp.int32)  # reference int()
    topv, topi = jax.lax.top_k(jnp.transpose(masked, (0, 2, 1)), k)  # [B,C-1,k]
    rank_ok = jnp.arange(k)[None, None, :] < k_real[:, None, None]
    valid_top = rank_ok & (topv > neg) & labels_fg[:, :, None]

    top_boxes = jnp.take_along_axis(boxes[:, None, :, :].repeat(c1, 1),
                                    topi[..., None], axis=2)  # [B,C-1,k,4]
    iou_kk = box_iou(top_boxes, top_boxes)  # [B,C-1,k,k]
    lower = jnp.tril(jnp.ones((k, k), bool), k=-1)
    # keep ii iff max IoU to ALL higher-ranked boxes < iou_div (ref line 37-40)
    max_prev = jnp.max(jnp.where(lower[None, None], iou_kk, -1.0), axis=-1)
    keep_k = ((max_prev < iou_div) | (jnp.arange(k) == 0)[None, None]) & valid_top

    # scatter kept top-k back to a [B, C-1, P] membership + score mask
    gt_mask = jnp.zeros((b, c1, p), jnp.int32)
    gt_score = jnp.zeros((b, c1, p), jnp.float32)
    bidx = jnp.arange(b)[:, None, None].repeat(c1, 1).repeat(k, 2)
    cidx = jnp.arange(c1)[None, :, None].repeat(b, 0).repeat(k, 2)
    gt_mask = gt_mask.at[bidx, cidx, topi].add(keep_k.astype(jnp.int32))
    gt_score = gt_score.at[bidx, cidx, topi].add(
        jnp.where(keep_k, topv.astype(jnp.float32), 0.0))
    return _assign(boxes, box_mask, gt_mask > 0, gt_score, fg_iou,
                   bg_strict_less=True, gt_cap=gt_cap, reg_weights=reg_weights)
