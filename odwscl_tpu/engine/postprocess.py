"""Detection post-processing: score threshold -> per-class NMS -> top-K.

Reference: wetectron/modeling/roi_heads/weak_head/inference.py:92-133 and
box_head/inference.py:216-258 (filter_results — identical logic; the
box_head variant is the one used at eval by ROIWeakRegHead via the AVG
heuristic). The kthvalue top-K semantics (keep scores >= k-th value, which
can return slightly more than K on ties) are preserved.

Split: the O(P^2 * C) NMS runs on device (batched masked NMS); the final
assembly of ragged per-image detection lists happens on host.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_nms_mask


@functools.partial(jax.jit, static_argnames=("nms_thresh", "score_thresh"))
def per_class_nms_keep(boxes: jnp.ndarray, scores: jnp.ndarray,
                       box_mask: jnp.ndarray, nms_thresh: float,
                       score_thresh: float) -> jnp.ndarray:
    """Device-side per-class NMS.

    boxes: [B, P, C, 4] (per-class regressed) or [B, P, 4] (shared);
    scores: [B, P, C] including background col 0; box_mask: [B, P].
    Returns keep [B, C, P] bool (background column always False).
    """
    b, p, c = scores.shape
    if boxes.ndim == 3:
        boxes_c = jnp.broadcast_to(boxes[:, :, None, :], (b, p, c, 4))
    else:
        boxes_c = boxes
    boxes_t = jnp.transpose(boxes_c, (0, 2, 1, 3))       # [B, C, P, 4]
    scores_t = jnp.transpose(scores, (0, 2, 1))          # [B, C, P]
    mask = box_mask[:, None, :] & (scores_t > score_thresh)
    mask = mask.at[:, 0, :].set(False)                   # skip background
    return batched_nms_mask(boxes_t, scores_t, mask, nms_thresh)


@functools.partial(jax.jit, static_argnames=("nms_thresh", "score_thresh",
                                              "k", "return_indices"))
def finalize_detections_device(boxes: jnp.ndarray, scores: jnp.ndarray,
                               box_mask: jnp.ndarray, nms_thresh: float,
                               score_thresh: float, k: int = 100,
                               return_indices: bool = False):
    """Full post-processing on device: per-class NMS + global top-K.

    Returns (boxes [B,K,4], scores [B,K], labels [B,K], valid [B,K]) —
    a tiny transfer instead of shipping [B,P,C]-sized tensors to host (the
    device->host tunnel is slow on this platform). Differs from the
    reference's kthvalue cap only when scores tie at the k-th value
    (top_k keeps exactly K; filter_results may keep more).
    """
    keep = per_class_nms_keep(boxes, scores, box_mask, nms_thresh,
                              score_thresh)          # [B, C, P]
    b, c, p = keep.shape
    if boxes.ndim == 3:
        boxes_c = jnp.broadcast_to(boxes[:, :, None, :], (b, p, c, 4))
    else:
        boxes_c = boxes.reshape(b, p, c, 4)
    scores_t = jnp.transpose(scores, (0, 2, 1))       # [B, C, P]
    boxes_t = jnp.transpose(boxes_c, (0, 2, 1, 3))    # [B, C, P, 4]
    flat_scores = jnp.where(keep, scores_t, -1.0).reshape(b, c * p)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    top_labels = (top_idx // p).astype(jnp.int32)
    top_boxes = jnp.take_along_axis(
        boxes_t.reshape(b, c * p, 4), top_idx[..., None], axis=1)
    valid = top_scores > 0.0  # score_thresh already applied via keep mask
    if return_indices:
        # source proposal slot per detection — the supervised stack's
        # detection-box mask pass gathers per-kept-roi mask logits with it
        return (top_boxes, top_scores, top_labels, valid,
                (top_idx % p).astype(jnp.int32))
    return top_boxes, top_scores, top_labels, valid


def detections_to_host(top_boxes, top_scores, top_labels, valid):
    """[B,K,...] device detections -> list of per-image dicts. One
    device_get for all four arrays — separate np.asarray() calls each pay
    a full host<->device round trip (latency-bound on a tunneled chip)."""
    import jax
    tb, ts, tl, tv = jax.device_get((top_boxes, top_scores, top_labels,
                                     valid))
    tb = np.asarray(tb, np.float32)
    ts = np.asarray(ts, np.float32)
    tl = np.asarray(tl, np.int64)
    tv = np.asarray(tv)
    out = []
    for i in range(tb.shape[0]):
        sel = tv[i]
        out.append({"boxes": tb[i][sel], "scores": ts[i][sel],
                    "labels": tl[i][sel]})
    return out


def assemble_detections(boxes: np.ndarray, scores: np.ndarray,
                        keep: np.ndarray, detections_per_img: int = 100
                        ) -> List[Dict[str, np.ndarray]]:
    """Host-side final assembly per image: gather kept (box, score, label),
    cap to `detections_per_img` with kthvalue semantics
    (weak_head/inference.py:124-133)."""
    out = []
    b, p, c = scores.shape
    if boxes.ndim == 3:
        boxes = np.broadcast_to(boxes[:, :, None, :], (b, p, c, 4))
    for i in range(b):
        det_boxes, det_scores, det_labels = [], [], []
        for j in range(1, c):
            sel = np.nonzero(keep[i, j])[0]
            if len(sel) == 0:
                continue
            det_boxes.append(boxes[i, sel, j])
            det_scores.append(scores[i, sel, j])
            det_labels.append(np.full(len(sel), j, np.int64))
        if det_boxes:
            db = np.concatenate(det_boxes)
            ds = np.concatenate(det_scores)
            dl = np.concatenate(det_labels)
        else:
            db = np.zeros((0, 4), np.float32)
            ds = np.zeros((0,), np.float32)
            dl = np.zeros((0,), np.int64)
        n = len(ds)
        if detections_per_img > 0 and n > detections_per_img:
            kth = np.partition(ds, n - detections_per_img)[n - detections_per_img]
            sel = ds >= kth
            db, ds, dl = db[sel], ds[sel], dl[sel]
        out.append({"boxes": db, "scores": ds, "labels": dl})
    return out


def resize_detections(dets: Dict[str, np.ndarray], from_wh, to_wh
                      ) -> Dict[str, np.ndarray]:
    """Rescale detection boxes between image sizes (BoxList.resize)."""
    rw = to_wh[0] / from_wh[0]
    rh = to_wh[1] / from_wh[1]
    boxes = dets["boxes"].copy()
    boxes[:, 0::2] *= rw
    boxes[:, 1::2] *= rh
    return {**dets, "boxes": boxes}
