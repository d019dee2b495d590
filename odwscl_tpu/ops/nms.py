"""Masked, statically-shaped NMS for TPU.

The reference calls torchvision ``nms`` at runtime (its own CUDA kernel is
commented out — reference wetectron/structures/boxlist_ops.py:31-32,56-57),
both in eval post-processing (weak_head/inference.py:112) and *inside the
training loss* via ``easy_nms`` (utils/utils.py:29). torchvision's IoU has NO
+1 offset and suppresses strictly-greater overlaps, so this module matches
that convention (unlike the +1 convention used everywhere else).

TPU design: instead of a sequential greedy loop (P serialized steps), we sort
by score, build the [P, P] upper-triangular suppression matrix once, and run
an antitone fixpoint iteration ``keep <- valid & ~(sup^T @ keep)``. Because
suppression only flows from higher-scored to lower-scored boxes the relation
is a DAG and the iteration converges to the exact greedy-NMS solution in at
most (chain depth + 1) sweeps — typically < 10 — each sweep one fused masked
reduction over the matrix. The whole thing is jit/vmap-friendly and O(P^2)
data-parallel work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iou_no_offset(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with torchvision conventions (no +1)."""
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, mask: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS over a masked set; returns the keep mask (original order).

    boxes: [P, 4] xyxy; scores: [P]; mask: [P] bool (padding / pre-filtered
    entries are False and can neither be kept nor suppress others).
    """
    p = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(-jnp.where(mask, scores, neg_inf), stable=True)
    b = boxes[order]
    valid = mask[order]

    iou = _iou_no_offset(b, b)
    row = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    # sup[j, i]: kept j (earlier in score order) would suppress i
    sup = (iou > iou_threshold) & (row < col) & valid[:, None] & valid[None, :]

    def body(state):
        keep, _ = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        return valid & ~suppressed, keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    keep_sorted, _ = jax.lax.while_loop(cond, body, (valid, jnp.zeros_like(valid)))
    return jnp.zeros_like(mask).at[order].set(keep_sorted)


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, mask: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """vmap of :func:`nms_mask` over any number of leading batch axes.

    boxes [..., P, 4], scores [..., P], mask [..., P] -> keep [..., P].
    """
    batch_shape = scores.shape[:-1]
    p = scores.shape[-1]
    flat_fn = jax.vmap(nms_mask, in_axes=(0, 0, 0, None))
    keep = flat_fn(boxes.reshape(-1, p, 4), scores.reshape(-1, p),
                   mask.reshape(-1, p), iou_threshold)
    return keep.reshape(*batch_shape, p)


def nms_numpy(boxes, scores, iou_threshold):
    """Host-side greedy NMS (numpy), torchvision conventions.

    Returns kept indices in descending-score order. Used by the host-side
    eval assembly and as the golden reference in tests.
    """
    import numpy as np

    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.clip(xx2 - xx1, 0, None)
        h = np.clip(yy2 - yy1, 0, None)
        inter = w * h
        union = areas[i] + areas - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed |= iou > iou_threshold
        suppressed[i] = True  # self; already kept
    return keep
