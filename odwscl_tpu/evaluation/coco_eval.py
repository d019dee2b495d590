"""COCO-style AP evaluation, native numpy (no pycocotools dependency).

Reference: wetectron/data/datasets/evaluation/coco/coco_eval.py:13-390 —
predictions are converted to COCO json results (xywh with the +1 width
convention via BoxList.convert, coco_eval.py prepare_for_coco_detection)
and scored with pycocotools COCOeval. This module reimplements the
COCOeval protocol for BOTH iou types: 10 IoU thresholds .5:.95, 101-point
interpolated precision, area ranges (all/small/medium/large), maxDets
100, crowd handling (IoU = intersection / det area, matches don't count
as TP/FP); `iou_types=("bbox","segm")` adds the segmentation task (mask
IoU on full-image instance masks — the reference's Masker +
maskUtils.iou path, mask_head/inference.py + coco_eval.py
prepare_for_coco_segmentation). Includes the reference's
`check_expected_results` regression assert (coco_eval.py:290+,
TEST.EXPECTED_RESULTS).
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from typing import Dict, List

import numpy as np

logger = logging.getLogger("odwscl_tpu.eval")

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = 100


def _iou_xyxy(det: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """[D,4] x [G,4] -> [D,G]; crowd gt uses intersection/det-area."""
    area_d = np.clip(det[:, 2] - det[:, 0], 0, None) * np.clip(det[:, 3] - det[:, 1], 0, None)
    area_g = np.clip(gt[:, 2] - gt[:, 0], 0, None) * np.clip(gt[:, 3] - gt[:, 1], 0, None)
    lt = np.maximum(det[:, None, :2], gt[None, :, :2])
    rb = np.minimum(det[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.where(iscrowd[None, :], area_d[:, None],
                     area_d[:, None] + area_g[None, :] - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _mask_iou(det_masks, gt_masks, iscrowd) -> np.ndarray:
    """[D][H,W] x [G][H,W] bool -> [D,G]; crowd gt uses
    intersection/det-area (the pycocotools maskUtils.iou convention)."""
    d, g = len(det_masks), len(gt_masks)
    out = np.zeros((d, g))
    areas_d = [int(m.sum()) for m in det_masks]
    areas_g = [int(m.sum()) for m in gt_masks]
    for di in range(d):
        for gi in range(g):
            inter = int((det_masks[di] & gt_masks[gi]).sum())
            union = (areas_d[di] if iscrowd[gi]
                     else areas_d[di] + areas_g[gi] - inter)
            out[di, gi] = inter / union if union > 0 else 0.0
    return out


def _match_image(det_boxes, det_scores, gt_boxes, gt_crowd, gt_ignore_area,
                 det_masks=None, gt_masks=None):
    """Greedy COCO matching for one (image, cat). Returns per-threshold
    (det_matched_gt_ignore, det_matched) flags plus gt count (non-ignored).
    When det_masks/gt_masks are given (lists of [H,W] bool), IoU is the
    segm-task mask IoU (COCOeval iouType='segm')."""
    order = np.argsort(-det_scores, kind="mergesort")[:MAX_DETS]
    det_boxes = det_boxes[order]
    d, g = len(det_boxes), len(gt_boxes)
    gt_ignore = gt_crowd | gt_ignore_area
    # sort gts: non-ignored first (COCOeval gtind sort)
    gt_order = np.argsort(gt_ignore, kind="mergesort")
    gt_boxes = gt_boxes[gt_order]
    gt_ig = gt_ignore[gt_order]
    crowd = gt_crowd[gt_order]
    if not (d and g):
        ious = np.zeros((d, g))
    elif det_masks is not None:
        ious = _mask_iou([det_masks[i] for i in order],
                         [gt_masks[i] for i in gt_order], crowd)
    else:
        ious = _iou_xyxy(det_boxes, gt_boxes, crowd)

    t = len(IOU_THRS)
    dt_m = -np.ones((t, d), int)
    gt_m = -np.ones((t, g), int)
    for ti, thr in enumerate(IOU_THRS):
        for di in range(d):
            best_iou = min(thr, 1 - 1e-10)
            best = -1
            for gi in range(g):
                if gt_m[ti, gi] >= 0 and not crowd[gi]:
                    continue
                if best >= 0 and not gt_ig[best] and gt_ig[gi]:
                    break  # can't beat a non-ignored match with ignored ones
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                best = gi
            if best >= 0:
                dt_m[ti, di] = best
                gt_m[ti, best] = di
    dt_ig = np.zeros((t, d), bool)
    if g:
        for ti in range(t):
            m = dt_m[ti]
            dt_ig[ti] = (m >= 0) & gt_ig[np.clip(m, 0, None)]
    return order, dt_m, dt_ig, int((~gt_ig).sum())


def evaluate_coco_bbox(gt_by_img_cat, det_by_img_cat, cat_ids, img_ids,
                       area_name: str = "all") -> Dict[str, float]:
    """gt/det dicts keyed (img, cat): gt -> (boxes xyxy, iscrowd, areas[,
    masks]); det -> (boxes xyxy, scores[, masks]). When masks (lists of
    [H, W] bool) are present the match runs the segm-task mask IoU and
    the det area-range filter uses mask areas (COCOeval iouType='segm')."""
    lo, hi = AREA_RANGES[area_name]
    t = len(IOU_THRS)
    precisions = -np.ones((t, len(RECALL_THRS), len(cat_ids)))
    recalls = -np.ones((t, len(cat_ids)))

    for ki, cat in enumerate(cat_ids):
        scores_all, matched_all, ignored_all = [], [], []
        npig = 0
        for img in img_ids:
            gt_e = gt_by_img_cat.get(
                (img, cat), (np.zeros((0, 4)), np.zeros(0, bool), np.zeros(0)))
            det_e = det_by_img_cat.get(
                (img, cat), (np.zeros((0, 4)), np.zeros(0)))
            gt_boxes, gt_crowd, gt_areas = gt_e[:3]
            gt_masks = gt_e[3] if len(gt_e) > 3 else None
            det_boxes, det_scores = det_e[:2]
            det_masks = det_e[2] if len(det_e) > 2 else None
            gt_ignore_area = (gt_areas < lo) | (gt_areas > hi)
            order, dt_m, dt_ig, n_pig = _match_image(
                det_boxes, det_scores, gt_boxes, gt_crowd, gt_ignore_area,
                det_masks, gt_masks)
            npig += n_pig
            d = len(order)
            if d:
                if det_masks is not None:
                    det_area = np.asarray(
                        [int(det_masks[i].sum()) for i in order], float)
                else:
                    det_area = ((det_boxes[order][:, 2]
                                 - det_boxes[order][:, 0])
                                * (det_boxes[order][:, 3]
                                   - det_boxes[order][:, 1]))
                area_out = (det_area < lo) | (det_area > hi)
                # unmatched dets outside the range are ignored (COCOeval)
                dt_ig = dt_ig | ((dt_m < 0) & area_out[None, :])
                scores_all.append(det_scores[order])
                matched_all.append(dt_m >= 0)
                ignored_all.append(dt_ig)
        if npig == 0:
            continue
        if scores_all:
            scores = np.concatenate(scores_all)
            matched = np.concatenate(matched_all, axis=1)
            ignored = np.concatenate(ignored_all, axis=1)
            order = np.argsort(-scores, kind="mergesort")
            matched = matched[:, order]
            ignored = ignored[:, order]
            tps = matched & ~ignored
            fps = ~matched & ~ignored
            tp_cum = np.cumsum(tps, axis=1).astype(float)
            fp_cum = np.cumsum(fps, axis=1).astype(float)
            for ti in range(t):
                tp, fp = tp_cum[ti], fp_cum[ti]
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, np.finfo(float).eps)
                recalls[ti, ki] = rc[-1] if len(rc) else 0.0
                # make precision monotonically decreasing
                pr = pr.tolist()
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(len(RECALL_THRS))
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                precisions[ti, :, ki] = q
        else:
            recalls[:, ki] = 0.0
            precisions[:, :, ki] = 0.0

    def _ap(sel):
        p = precisions[sel] if sel is not None else precisions
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    ap = _ap(None)
    ap50 = _ap(np.isclose(IOU_THRS, 0.5))
    ap75 = _ap(np.isclose(IOU_THRS, 0.75))
    r = recalls[recalls > -1]
    ar = float(r.mean()) if r.size else -1.0
    return {"AP": ap, "AP50": ap50, "AP75": ap75, "AR": ar,
            "precisions": precisions}


def do_coco_evaluation(dataset, predictions: List[Dict], output_folder=None,
                       expected_results=None, sigma_tol: float = 4.0,
                       iou_types=("bbox",)) -> Dict:
    """Predictions (original coords, contiguous labels) -> COCO metrics.

    iou_types: ("bbox",) by default; add "segm" to also score the
    segmentation task (ref coco_eval.py:13 iou_types + the Masker path
    in mask_head/inference.py). For segm, each prediction must carry
    "masks": [N, H, W] bool full-image instance masks (the output of
    models.mask_head.Masker) at the original image size, and GT masks are
    rasterized from the annotations' "segmentation" polygons
    (structures/masks.py)."""
    gt_by, det_by = {}, {}
    gt_by_segm, det_by_segm = {}, {}
    do_segm = "segm" in iou_types
    img_ids = []
    for idx, pred in enumerate(predictions):
        img_id = dataset.get_origin_id(idx)
        img_ids.append(img_id)
        if do_segm:
            info = dataset.get_img_info(idx)
            im_w, im_h = info["width"], info["height"]
        anns = dataset.coco.img_to_anns[img_id]
        by_cat = defaultdict(lambda: ([], [], [], []))
        for a in anns:
            x, y, w, h = a["bbox"]
            c = dataset.json_category_id_to_contiguous_id[a["category_id"]]
            bl, cl, al, ml = by_cat[c]
            bl.append([x, y, x + w, y + h])
            cl.append(bool(a.get("iscrowd", 0)))
            al.append(a.get("area", w * h))
            if do_segm:
                # polygons or RLE dicts (ref loads both via pycocotools;
                # structures/rle.py is the pure-python codec)
                from ..structures.rle import rasterize_segmentation
                seg = a.get("segmentation") or []
                ml.append(rasterize_segmentation(seg, im_h,
                                                 im_w).astype(bool))
        for c, (bl, cl, al, ml) in by_cat.items():
            gt_by[(img_id, c)] = (np.asarray(bl, float),
                                  np.asarray(cl, bool), np.asarray(al, float))
            if do_segm:
                gt_by_segm[(img_id, c)] = gt_by[(img_id, c)] + (ml,)
        boxes = np.asarray(pred["boxes"], float).reshape(-1, 4)
        labels = np.asarray(pred["labels"], int)
        scores = np.asarray(pred["scores"], float)
        masks = np.asarray(pred["masks"]) if do_segm else None
        # xyxy (+1 convention) -> COCO xywh -> xyxy continuous
        for c in np.unique(labels):
            sel = labels == c
            bb = boxes[sel].copy()
            bb[:, 2:] += 1.0  # reference converts through xywh with w=x2-x1+1
            det_by[(img_id, int(c))] = (bb, scores[sel])
            if do_segm:
                det_by_segm[(img_id, int(c))] = (
                    bb, scores[sel],
                    [m.astype(bool) for m in masks[sel]])

    cat_ids = sorted({c for (_, c) in list(gt_by.keys()) + list(det_by.keys())})
    results = {}
    tasks = [("", gt_by, det_by)]
    if do_segm:
        tasks.append(("segm_", gt_by_segm, det_by_segm))
    for prefix, g_by, d_by in tasks:
        for area in ("all", "small", "medium", "large"):
            r = evaluate_coco_bbox(g_by, d_by, cat_ids, img_ids, area)
            if area == "all":
                results.update({f"{prefix}AP": r["AP"],
                                f"{prefix}AP50": r["AP50"],
                                f"{prefix}AP75": r["AP75"],
                                f"{prefix}AR": r["AR"]})
            else:
                results[f"{prefix}AP_{area[0]}"] = r["AP"]
    line = ("AP {AP:.4f} | AP50 {AP50:.4f} | AP75 {AP75:.4f} | APs {AP_s:.4f} "
            "| APm {AP_m:.4f} | APl {AP_l:.4f}").format(**results)
    if do_segm:
        line += ("\nsegm: AP {segm_AP:.4f} | AP50 {segm_AP50:.4f} | "
                 "AP75 {segm_AP75:.4f} | APs {segm_AP_s:.4f} | "
                 "APm {segm_AP_m:.4f} | APl {segm_AP_l:.4f}").format(**results)
    logger.info(line)
    if output_folder:
        with open(os.path.join(output_folder, "coco_results.txt"), "w") as f:
            f.write(line + "\n")
    check_expected_results(results, expected_results or [], sigma_tol)
    return results


def check_expected_results(results: Dict, expected, sigma_tol: float):
    """reference coco_eval.py check_expected_results: assert metric within
    mean +- sigma_tol * std. expected: [(task, metric, mean, std), ...]."""
    for task, metric, mean, std in expected:
        actual = results.get(metric)
        if actual is None:
            continue
        lo, hi = mean - sigma_tol * std, mean + sigma_tol * std
        msg = (f"{task} {metric}: {actual:.4f} vs expected "
               f"{mean:.4f} +/- {sigma_tol}x{std:.4f}")
        if not (lo < actual < hi):
            logger.error("FAIL: %s", msg)
        else:
            logger.info("PASS: %s", msg)
