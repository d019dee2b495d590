"""Native C++ host ops vs their numpy references."""

import numpy as np

from odwscl_tpu.utils import host_ops
from odwscl_tpu.ops.nms import nms_numpy
from odwscl_tpu.utils.host_ops import _clean_numpy


def _boxes(rng, n):
    x1y1 = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    return np.concatenate([x1y1, x1y1 + wh], 1)


def test_native_nms_matches_numpy():
    rng = np.random.RandomState(0)
    boxes = _boxes(rng, 200).astype(np.float32)
    scores = rng.uniform(size=200).astype(np.float32)
    got = host_ops.nms(boxes, scores, 0.4)
    want = nms_numpy(boxes, scores, 0.4)
    assert got == want


def test_native_iou_matches_numpy():
    rng = np.random.RandomState(1)
    a = _boxes(rng, 37)
    b = _boxes(rng, 23)
    got = host_ops.iou_plus1(a, b)
    from odwscl_tpu.evaluation.voc_eval import _iou_plus1
    want = _iou_plus1(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_native_clean_matches_numpy():
    rng = np.random.RandomState(2)
    boxes = _boxes(rng, 300)
    boxes[50:70] = boxes[:20]          # duplicates
    boxes[100:110, 2] = boxes[100:110, 0] + 3  # tiny boxes
    boxes[200:210] += 500              # outside -> clipped
    got = host_ops.clean_proposals(boxes, 160.0, 140.0, 20.0)
    want = _clean_numpy(boxes, 160.0, 140.0, 20.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
