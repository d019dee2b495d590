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
