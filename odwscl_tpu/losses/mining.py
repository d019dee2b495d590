"""Contrastive pseudo-GT mining (the paper's object-discovery core).

Reference: wetectron/modeling/roi_heads/weak_head/loss.py:271-345
(RoIRegLossComputation.__call__, the ``cfg.SOLVER.CONTRA`` branch). The
reference runs nested Python loops over images x 3 branches x positive
classes with dynamically growing index tensors and a mid-loss numpy
round-trip; here everything is batched masked tensor ops over static
shapes [B, C-1, P] so the whole miner lives inside the jitted train step.

Structure (faithful to the reference control flow):

Stage A (loss.py:281-307): per (image, branch, positive class) take the
  top-scoring proposal, collect every proposal with IoU >= cfg.thres to it
  (utils/utils.py:23 `cal_iou`, +1 IoU convention); the union over branches
  seeds the per-class bank membership A_mask and the initial pgt_index. Each
  member contributes THREE bank entries: its clean embedding plus dropblock
  and noise views (computed by the caller on the compacted slots).

Stage B (loss.py:309-345): per branch (sequential: the dedup set carries
  across branches), per (image, positive class): threshold the max-box
  similarity row at the mean similarity to the stage-A bank, run the
  reference's exact boolean `ge`-chain against other positive classes'
  max rows, NMS the surviving cluster at cfg.nms (easy_nms), fall back to
  {max_index} when empty, record the set for od_layer (pgt_instance), dedup
  against pgt_index and append the new clean embeddings to the bank.

Compaction: bank membership masks are compacted into fixed-capacity slot
buffers with `jnp.nonzero(size=...)` — deterministic first-N in (image,
class, proposal) order; overflow is counted and reported so capacity can be
sized from data.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import box_iou
from ..ops.nms import nms_mask


class StageAResult(NamedTuple):
    a_mask: jnp.ndarray      # [B, C-1, P] bank membership from IoU seeding
    hardness: jnp.ndarray    # [B, C-1, P] score_c / sum_p score_c  (loss.py:294)
    max_idx: jnp.ndarray     # [R, B, C-1] per-branch top proposal
    # compacted slots over the flattened (B, C-1, P) A-mask:
    slot_b: jnp.ndarray      # [capA] image index (or -1)
    slot_c: jnp.ndarray      # [capA] fg class index
    slot_p: jnp.ndarray      # [capA] proposal index
    slot_valid: jnp.ndarray  # [capA]
    overflow: jnp.ndarray    # scalar: #bank members dropped by compaction


class StageBResult(NamedTuple):
    pgt_instance: jnp.ndarray  # [R, B, C-1, P] sets consumed by od_layer
    sb_mask: jnp.ndarray       # [R, B, C-1, P] new clean bank entries
    slot_b: jnp.ndarray        # [capB]
    slot_c: jnp.ndarray
    slot_p: jnp.ndarray
    slot_r: jnp.ndarray        # branch of each stage-B slot
    slot_valid: jnp.ndarray
    overflow: jnp.ndarray


def _one_hot_p(idx: jnp.ndarray, p: int) -> jnp.ndarray:
    """one-hot over the proposal axis for int index array idx [...]."""
    return jax.nn.one_hot(idx, p, dtype=jnp.bool_)


def _branch_fg_scores(final_score: jnp.ndarray, ref_softmax: jnp.ndarray
                      ) -> jnp.ndarray:
    """Stack per-branch source scores (loss.py:283): branch 0 uses the WSDDN
    final score, branch i>0 uses softmax of branch i-1's logits. Returns
    foreground-only scores [R, B, C-1, P]."""
    r = ref_softmax.shape[0]
    sources = [final_score] + [ref_softmax[i] for i in range(r - 1)]
    stacked = jnp.stack(sources, axis=0)  # [R, B, P, C]
    return jnp.transpose(stacked[..., 1:], (0, 1, 3, 2))  # drop bg -> [R,B,C-1,P]


def stage_a(boxes: jnp.ndarray, box_mask: jnp.ndarray, labels_fg: jnp.ndarray,
            final_score: jnp.ndarray, ref_softmax: jnp.ndarray,
            p_thres: float, cap_a: int) -> StageAResult:
    """IoU seeding of the per-class banks (loss.py:281-307).

    boxes [B,P,4]; box_mask [B,P]; labels_fg [B,C-1] bool;
    final_score [B,P,C] (WSDDN, col 0 = bg); ref_softmax [R,B,P,C].
    """
    b, p, _ = final_score.shape
    scores = _branch_fg_scores(final_score, ref_softmax)  # [R,B,C-1,P]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(box_mask[None, :, None, :], scores, neg)
    max_idx = jnp.argmax(masked_scores, axis=-1)  # [R,B,C-1]

    # IoU of every proposal to each branch's max box; union over branches.
    def branch_a(mi):
        mbox = jnp.take_along_axis(boxes, mi[..., None], axis=1)  # [B,C-1,4]
        iou = box_iou(boxes, mbox)  # [B,P,C-1]
        return jnp.transpose(iou, (0, 2, 1)) >= p_thres  # [B,C-1,P]

    a_mask = jnp.zeros((b, labels_fg.shape[1], p), dtype=bool)
    for r in range(scores.shape[0]):
        a_mask |= branch_a(max_idx[r])
    a_mask &= box_mask[:, None, :] & labels_fg[:, :, None]

    # hardness weights (loss.py:294): fg score normalized per (image, class)
    fg = jnp.transpose(final_score[..., 1:], (0, 2, 1))  # [B,C-1,P]
    fg = jnp.where(box_mask[:, None, :], fg, 0.0)
    hardness = fg / jnp.clip(fg.sum(axis=-1, keepdims=True), 1e-12)

    flat = a_mask.reshape(-1)
    (slot_flat,) = jnp.nonzero(flat, size=cap_a, fill_value=-1)
    valid = slot_flat >= 0
    c1 = labels_fg.shape[1]
    slot_b = jnp.where(valid, slot_flat // (c1 * p), -1)
    slot_c = jnp.where(valid, (slot_flat // p) % c1, 0)
    slot_p = jnp.where(valid, slot_flat % p, 0)
    overflow = jnp.maximum(flat.sum() - valid.sum(), 0)
    return StageAResult(a_mask, hardness, max_idx, slot_b, slot_c, slot_p,
                        valid, overflow)


def _compact_cluster_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                         cluster: jnp.ndarray, nms_iou: float,
                         cap: int) -> jnp.ndarray:
    """easy_nms (utils/utils.py:29): NMS restricted to a masked cluster.

    boxes [P,4], scores [P], cluster [P] bool -> keep mask [P].
    The cluster is compacted to `cap` slots first so the O(K^2) NMS matrix
    stays small (sim_close sets are tens of proposals, not thousands).
    """
    p = boxes.shape[0]
    (idx,) = jnp.nonzero(cluster, size=cap, fill_value=-1)
    valid = idx >= 0
    safe = jnp.clip(idx, 0)
    keep_small = nms_mask(boxes[safe], scores[safe], valid, nms_iou)
    # scatter-add on int: invalid slots all alias index 0 but contribute 0
    keep = jnp.zeros((p,), jnp.int32).at[safe].add(
        (keep_small & valid).astype(jnp.int32), mode="drop")
    return keep > 0


def stage_b(boxes: jnp.ndarray, box_mask: jnp.ndarray, labels_fg: jnp.ndarray,
            final_score: jnp.ndarray, ref_softmax: jnp.ndarray,
            z_clean: jnp.ndarray, z_drop_slots: jnp.ndarray,
            z_noise_slots: jnp.ndarray, a: StageAResult,
            nms_iou: float, cap_b: int, cluster_cap: int = 256) -> StageBResult:
    """Similarity mining (loss.py:309-345).

    z_clean [B,P,D]; z_drop_slots / z_noise_slots [capA, D] — augmented-view
    embeddings of the compacted stage-A slots (computed by the model).
    """
    b, p, d = z_clean.shape
    c1 = labels_fg.shape[1]
    r = ref_softmax.shape[0]
    scores = _branch_fg_scores(final_score, ref_softmax)  # [R,B,C-1,P]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(box_mask[None, :, None, :], scores, neg)
    max_idx = jnp.argmax(masked_scores, axis=-1)  # [R,B,C-1] == a.max_idx

    # Stage-A bank embeddings per slot (clean + the two augmented views).
    z_slot_clean = z_clean[jnp.clip(a.slot_b, 0), a.slot_p]  # [capA, D]
    slot_onehot = (jax.nn.one_hot(a.slot_c, c1, dtype=jnp.float32)
                   * a.slot_valid[:, None].astype(jnp.float32))  # [capA, C-1]
    count_a = slot_onehot.sum(axis=0)  # [C-1] bank size per class (clean only)

    pgt_index0 = a.a_mask
    z_bank_sum = z_slot_clean + z_drop_slots + z_noise_slots  # [capA, D]

    pgt_instances, sb_masks = [], []
    pgt_index = pgt_index0
    for i in range(r):
        mi = max_idx[i]                                      # [B,C-1]
        z_max = jnp.take_along_axis(z_clean, mi[..., None], axis=1)  # [B,C-1,D]
        simrow = jnp.einsum("bcd,bpd->bcp", z_max, z_clean)  # [B,C-1,P]

        # sim_thresh (loss.py:320): mean dot of z_max to ALL stage-A bank
        # entries of the class (3 views per member, every image's members).
        dots = jnp.einsum("bcd,sd->bcs", z_max, z_bank_sum)  # [B,C-1,capA]
        num = jnp.einsum("bcs,sc->bc", dots, slot_onehot)
        sim_thresh = num / jnp.clip(3.0 * count_a[None, :], 1e-12)

        # the reference's exact boolean chain (loss.py:322-330):
        # cur starts as (sim >= thresh); for each other positive class c',
        # cur <- (float(cur) >= simrow[c']).
        cur = simrow >= sim_thresh[..., None]
        for cq in range(c1):
            active = labels_fg[:, cq]                        # [B]
            neg_row = simrow[:, cq, :][:, None, :]           # [B,1,P]
            chained = cur.astype(jnp.float32) >= neg_row
            is_other = jnp.ones((c1,), bool).at[cq].set(False)[None, :, None]
            apply = active[:, None, None] & is_other
            cur = jnp.where(apply, chained, cur)

        cur &= box_mask[:, None, :] & labels_fg[:, :, None]

        # easy_nms over the cluster at cfg.nms (loss.py:332)
        sc = scores[i]  # [B,C-1,P]
        flat_keep = jax.vmap(jax.vmap(
            _compact_cluster_nms, in_axes=(None, 0, 0, None, None)),
            in_axes=(0, 0, 0, None, None))(
            boxes, sc, cur, nms_iou, cluster_cap)

        # empty fallback -> {max_index} (loss.py:333)
        had_any = jnp.any(cur, axis=-1, keepdims=True)
        fallback = _one_hot_p(mi, p) & labels_fg[:, :, None]
        sim_close = jnp.where(had_any, flat_keep, fallback)
        pgt_instances.append(sim_close)

        # dedup vs pgt_index; empty -> {max_index} again (loss.py:336-338)
        new = sim_close & ~pgt_index
        any_new = jnp.any(new, axis=-1, keepdims=True)
        new = jnp.where(any_new, new, fallback)
        sb_masks.append(new)
        pgt_index = pgt_index | new

    pgt_instance = jnp.stack(pgt_instances)  # [R,B,C-1,P]
    sb_mask = jnp.stack(sb_masks)            # [R,B,C-1,P]

    flat = sb_mask.reshape(-1)
    (slot_flat,) = jnp.nonzero(flat, size=cap_b, fill_value=-1)
    valid = slot_flat >= 0
    per_r = b * c1 * p
    slot_r = jnp.where(valid, slot_flat // per_r, 0)
    rem = slot_flat % per_r
    slot_b = jnp.where(valid, rem // (c1 * p), -1)
    slot_c = jnp.where(valid, (rem // p) % c1, 0)
    slot_p = jnp.where(valid, rem % p, 0)
    overflow = jnp.maximum(flat.sum() - valid.sum(), 0)
    return StageBResult(pgt_instance, sb_mask, slot_b, slot_c, slot_p, slot_r,
                        valid, overflow)


def assemble_bank(a: StageAResult, sb: StageBResult, z_clean: jnp.ndarray,
                  z_drop_slots: jnp.ndarray, z_noise_slots: jnp.ndarray,
                  z_a_clean: jnp.ndarray | None = None,
                  z_b_clean: jnp.ndarray | None = None,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten the banks for SupCon: (features [E,D], labels [E], hardness [E],
    valid [E]) with E = 3*capA + capB. Entry order mirrors the reference's
    append order semantics (order is irrelevant to the loss value).

    z_a_clean / z_b_clean optionally supply the clean-path bank entries
    pre-gathered (the detector recomputes them differentiably on the mined
    rows so the all-roi clean pass can run gradient-free, detector.py
    train_forward); when omitted they are gathered from z_clean."""
    if z_a_clean is None:
        z_a_clean = z_clean[jnp.clip(a.slot_b, 0), a.slot_p]
    if z_b_clean is None:
        z_b_clean = z_clean[jnp.clip(sb.slot_b, 0), sb.slot_p]
    feats = jnp.concatenate([z_a_clean, z_drop_slots, z_noise_slots, z_b_clean])

    h_a = a.hardness[jnp.clip(a.slot_b, 0), a.slot_c, a.slot_p]
    h_b = a.hardness[jnp.clip(sb.slot_b, 0), sb.slot_c, sb.slot_p]
    hardness = jnp.concatenate([h_a, h_a, h_a, h_b])

    labels = jnp.concatenate([a.slot_c, a.slot_c, a.slot_c, sb.slot_c])
    valid = jnp.concatenate([a.slot_valid] * 3 + [sb.slot_valid])
    return feats, labels, hardness, valid
