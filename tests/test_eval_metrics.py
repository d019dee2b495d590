"""Evaluator goldens: VOC 11-pt AP on toy inputs, CorLoc, COCO AP sanity."""

import numpy as np

from odwscl_tpu.evaluation import (eval_detection_voc, calc_detection_voc_ap,
                                   do_coco_evaluation)


def _det(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, float),
            "scores": np.asarray(scores, float),
            "labels": np.asarray(labels, int)}


def test_voc_ap_perfect_detections():
    gt = [(np.array([[10, 10, 50, 50], [60, 60, 90, 90]], float),
           np.array([1, 2]), np.array([False, False]))]
    preds = [_det([[10, 10, 50, 50], [60, 60, 90, 90]], [0.9, 0.8], [1, 2])]
    res = eval_detection_voc(preds, gt, use_07_metric=True)
    np.testing.assert_allclose(res["ap"][1], 1.0)
    np.testing.assert_allclose(res["ap"][2], 1.0)


def test_voc_ap_11pt_half_recall():
    # 2 GT of class 1, only 1 detected -> recall caps at .5:
    # 11-pt AP = 6/11 (precision 1 at t in {0,...,0.5})
    gt = [(np.array([[10, 10, 50, 50], [100, 100, 150, 150]], float),
           np.array([1, 1]), np.array([False, False]))]
    preds = [_det([[10, 10, 50, 50]], [0.9], [1])]
    res = eval_detection_voc(preds, gt, use_07_metric=True)
    np.testing.assert_allclose(res["ap"][1], 6 / 11, rtol=1e-6)


def test_voc_duplicate_detection_is_fp():
    gt = [(np.array([[10, 10, 50, 50]], float), np.array([1]),
           np.array([False]))]
    preds = [_det([[10, 10, 50, 50], [11, 11, 51, 51]], [0.9, 0.8], [1, 1])]
    res = eval_detection_voc(preds, gt, use_07_metric=False)
    # AP = area under PR with precisions [1, .5] at recall 1 -> AP = 1.0
    np.testing.assert_allclose(res["ap"][1], 1.0, rtol=1e-6)


def test_voc_difficult_ignored():
    gt = [(np.array([[10, 10, 50, 50]], float), np.array([1]),
           np.array([True]))]
    preds = [_det([[10, 10, 50, 50]], [0.9], [1])]
    res = eval_detection_voc(preds, gt, use_07_metric=True)
    assert np.isnan(res["ap"][1])  # no non-difficult GT -> class skipped


class _ToyCocoDataset:
    """Minimal duck-typed COCO dataset for do_coco_evaluation."""

    def __init__(self, anns_per_img):
        from collections import defaultdict

        class C:
            pass

        self.coco = C()
        self.coco.img_to_anns = defaultdict(list)
        for i, anns in enumerate(anns_per_img):
            self.coco.img_to_anns[i] = anns
        self.json_category_id_to_contiguous_id = {1: 1, 2: 2}

    def get_origin_id(self, idx):
        return idx


def test_coco_ap_perfect():
    anns = [[{"bbox": [10, 10, 40, 40], "category_id": 1, "iscrowd": 0,
              "area": 1600}]]
    ds = _ToyCocoDataset(anns)
    # detections stored xyxy with the +1 convention removed in eval prep
    preds = [_det([[10, 10, 49, 49]], [0.9], [1])]
    res = do_coco_evaluation(ds, preds)
    np.testing.assert_allclose(res["AP50"], 1.0)
    assert res["AP"] > 0.9


def test_coco_ap_miss():
    anns = [[{"bbox": [10, 10, 40, 40], "category_id": 1, "iscrowd": 0,
              "area": 1600}]]
    ds = _ToyCocoDataset(anns)
    preds = [_det([[200, 200, 240, 240]], [0.9], [1])]
    res = do_coco_evaluation(ds, preds)
    np.testing.assert_allclose(res["AP"], 0.0)


# ---------------------------------------------------------------------------
# COCO AP: randomized N-version validation (VERDICT r1 #7). pycocotools is
# not installed and has no source on this machine (no egress), so the oracle
# below is an independently-structured brute-force implementation of the
# published COCOeval bbox protocol: per-(category, threshold) greedy
# matching over globally score-sorted detections, AP as max-precision at
# recall >= r over the 101-point grid.
# ---------------------------------------------------------------------------

def _oracle_coco_ap(gt_by_img_cat, det_by_img_cat, cat_ids, img_ids,
                    area_rng, iou_thrs, max_dets=100):
    import numpy as np

    def iou(db, gb, crowd):
        lt = np.maximum(db[:, None, :2], gb[None, :, :2])
        rb = np.minimum(db[:, None, 2:], gb[None, :, 2:])
        inter = np.clip(rb - lt, 0, None).prod(axis=2)
        ad = np.clip(db[:, 2:] - db[:, :2], 0, None).prod(axis=1)
        ag = np.clip(gb[:, 2:] - gb[:, :2], 0, None).prod(axis=1)
        denom = np.where(crowd[None, :], ad[:, None],
                         ad[:, None] + ag[None, :] - inter)
        return inter / np.maximum(denom, 1e-12)

    lo, hi = area_rng
    aps = []
    for cat in cat_ids:
        per_thr_flags = {t: [] for t in iou_thrs}  # (score, img_no, tp, ig)
        npig = 0
        for img in img_ids:
            gb, crowd, areas = gt_by_img_cat.get(
                (img, cat), (np.zeros((0, 4)), np.zeros(0, bool),
                             np.zeros(0)))
            db, scores = det_by_img_cat.get(
                (img, cat), (np.zeros((0, 4)), np.zeros(0)))
            keep = np.argsort(-scores, kind="mergesort")[:max_dets]
            db, scores = db[keep], scores[keep]
            gt_ig = crowd | (areas < lo) | (areas > hi)
            # non-ignored gts first, stable
            go = np.argsort(gt_ig, kind="mergesort")
            gb, crowd_s, gt_ig = gb[go], crowd[go], gt_ig[go]
            npig += int((~gt_ig).sum())
            m = iou(db, gb, crowd_s) if len(db) and len(gb) else None
            det_area = np.clip(db[:, 2:] - db[:, :2], 0, None).prod(axis=1)
            for t in iou_thrs:
                taken = np.zeros(len(gb), bool)
                for di in range(len(db)):
                    best, best_iou = -1, min(t, 1 - 1e-10)
                    for gi in range(len(gb)):
                        if taken[gi] and not crowd_s[gi]:
                            continue
                        if best >= 0 and not gt_ig[best] and gt_ig[gi]:
                            break
                        if m is None or m[di, gi] < best_iou:
                            continue
                        best, best_iou = gi, m[di, gi]
                    if best >= 0:
                        if not crowd_s[best]:
                            taken[best] = True
                        per_thr_flags[t].append(
                            (scores[di], img, bool(gt_ig[best]), True))
                    else:
                        out = det_area[di] < lo or det_area[di] > hi
                        per_thr_flags[t].append(
                            (scores[di], img, bool(out), False))
        if npig == 0:
            continue
        for t in iou_thrs:
            flags = per_thr_flags[t]
            order = sorted(range(len(flags)),
                           key=lambda i: -flags[i][0])  # unstable ok: see note
            # stable global sort by -score (mergesort equivalent: python
            # sorted is stable, and flags are appended in image order)
            tp = fp = 0
            pr_at = []
            for i in order:
                _, _, ig, matched = flags[i]
                if ig:
                    continue
                if matched:
                    tp += 1
                else:
                    fp += 1
                pr_at.append((tp / npig, tp / (tp + fp)))
            ap = 0.0
            for r in np.linspace(0, 1, 101):
                best = 0.0
                for rc, pr in pr_at:
                    if rc >= r - 1e-12 and pr > best:
                        best = pr
                ap += best / 101
            aps.append(ap)
    import numpy as np
    return float(np.mean(aps)) if aps else -1.0


def test_coco_eval_matches_independent_oracle():
    import numpy as np
    from odwscl_tpu.evaluation.coco_eval import (evaluate_coco_bbox,
                                                 IOU_THRS, AREA_RANGES)

    rng = np.random.RandomState(42)
    img_ids = list(range(12))
    cat_ids = [1, 2, 3]
    gt_by, det_by = {}, {}
    for img in img_ids:
        for cat in cat_ids:
            g = rng.randint(0, 5)
            if g:
                wh = np.exp(rng.uniform(np.log(8), np.log(200), (g, 2)))
                xy = rng.uniform(0, 400, (g, 2))
                boxes = np.concatenate([xy, xy + wh], axis=1)
                crowd = rng.uniform(size=g) < 0.2
                areas = wh.prod(axis=1)
                gt_by[(img, cat)] = (boxes, crowd, areas)
                # detections: jittered copies of some gts + pure noise
                d = rng.randint(0, 7)
                if d:
                    src = boxes[rng.randint(0, g, d)]
                    jit = rng.randn(d, 4) * rng.choice([2.0, 30.0], d)[:, None]
                    db = src + jit
                    db = np.concatenate([np.minimum(db[:, :2], db[:, 2:] - 1),
                                         np.maximum(db[:, 2:], db[:, :2] + 1)],
                                        axis=1)
                    det_by[(img, cat)] = (db, rng.uniform(0.05, 1.0, d))
            elif rng.uniform() < 0.3:  # dets with no gt at all
                xy = rng.uniform(0, 400, (2, 2))
                db = np.concatenate([xy, xy + 20], axis=1)
                det_by[(img, cat)] = (db, rng.uniform(0.05, 1.0, 2))

    for area in ("all", "small", "medium", "large"):
        res = evaluate_coco_bbox(gt_by, det_by, cat_ids, img_ids, area)
        oracle = _oracle_coco_ap(gt_by, det_by, cat_ids, img_ids,
                                 AREA_RANGES[area], list(IOU_THRS))
        np.testing.assert_allclose(res["AP"], oracle, atol=1e-9,
                                   err_msg=area)


class _ToyCocoSegmDataset(_ToyCocoDataset):
    def __init__(self, anns_per_img, sizes):
        super().__init__(anns_per_img)
        self._sizes = sizes

    def get_img_info(self, idx):
        w, h = self._sizes[idx]
        return {"width": w, "height": h}


def test_coco_segm_perfect_and_degraded():
    """segm task (iou_types): exact predicted masks score AP50=1; masks
    eroded well below the 0.5-IoU bar score 0."""
    # GT: a 20x20 square instance as a rectangle polygon
    seg = [[10.0, 10.0, 29.0, 10.0, 29.0, 29.0, 10.0, 29.0]]
    anns = [[{"bbox": [10, 10, 20, 20], "category_id": 1, "iscrowd": 0,
              "area": 400, "segmentation": seg}]]
    ds = _ToyCocoSegmDataset(anns, sizes=[(64, 48)])

    from odwscl_tpu.structures.masks import rasterize_polygons
    gt_mask = rasterize_polygons([np.asarray(seg[0])], 48, 64).astype(bool)

    pred = _det([[10, 10, 29, 29]], [0.9], [1])
    pred["masks"] = gt_mask[None]
    res = do_coco_evaluation(ds, [pred], iou_types=("bbox", "segm"))
    np.testing.assert_allclose(res["segm_AP50"], 1.0)
    np.testing.assert_allclose(res["AP50"], 1.0)   # bbox task still runs

    # a 6x6 mask inside the 20x20 gt: IoU = 36/400 < 0.5 everywhere
    small = np.zeros_like(gt_mask)
    small[12:18, 12:18] = True
    pred2 = dict(pred)
    pred2["masks"] = small[None]
    res2 = do_coco_evaluation(ds, [pred2], iou_types=("bbox", "segm"))
    np.testing.assert_allclose(res2["segm_AP"], 0.0)
    np.testing.assert_allclose(res2["AP50"], 1.0)  # bbox unaffected


def test_coco_segm_crowd_ignore():
    """crowd GT masks use intersection/det-area IoU and do not count as
    TP/FP (COCOeval crowd semantics carried to the segm task)."""
    seg = [[0.0, 0.0, 39.0, 0.0, 39.0, 39.0, 0.0, 39.0]]
    anns = [[{"bbox": [0, 0, 40, 40], "category_id": 1, "iscrowd": 1,
              "area": 1600, "segmentation": seg}]]
    ds = _ToyCocoSegmDataset(anns, sizes=[(64, 48)])
    det_mask = np.zeros((48, 64), bool)
    det_mask[5:15, 5:15] = True        # fully inside the crowd region
    pred = _det([[5, 5, 14, 14]], [0.9], [1])
    pred["masks"] = det_mask[None]
    res = do_coco_evaluation(ds, [pred], iou_types=("bbox", "segm"))
    # only-crowd GT -> no positives -> category skipped entirely
    assert res["segm_AP"] == -1.0
