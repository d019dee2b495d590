"""Masked on-device NMS must match greedy host NMS (torchvision semantics)."""

import numpy as np
import jax.numpy as jnp

from odwscl_tpu.ops import nms_mask, batched_nms_mask, nms_numpy


def _random_case(rng, n):
    x1y1 = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(4, 40, (n, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_matches_greedy():
    rng = np.random.RandomState(42)
    for thresh in (0.1, 0.4, 0.5):
        boxes, scores = _random_case(rng, 64)
        mask = np.ones(64, dtype=bool)
        keep_dev = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores),
                                       jnp.array(mask), thresh))
        keep_ref = set(nms_numpy(boxes, scores, thresh))
        assert set(np.nonzero(keep_dev)[0].tolist()) == keep_ref


def test_nms_respects_mask():
    rng = np.random.RandomState(0)
    boxes, scores = _random_case(rng, 32)
    mask = np.zeros(32, dtype=bool)
    mask[:10] = True
    keep_dev = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores),
                                   jnp.array(mask), 0.3))
    assert not keep_dev[10:].any()
    keep_ref = set(nms_numpy(boxes[:10], scores[:10], 0.3))
    assert set(np.nonzero(keep_dev)[0].tolist()) == keep_ref


def test_nms_duplicate_boxes_suppressed():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.1], dtype=np.float32)
    keep = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores),
                               jnp.ones(3, dtype=bool), 0.5))
    assert keep.tolist() == [True, False, True]


def test_batched_nms_vmaps():
    rng = np.random.RandomState(7)
    b, c, n = 2, 3, 48
    boxes = np.stack([np.stack([_random_case(rng, n)[0] for _ in range(c)]) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, c, n)).astype(np.float32)
    mask = rng.uniform(0, 1, (b, c, n)) > 0.2
    keep = np.asarray(batched_nms_mask(jnp.array(boxes), jnp.array(scores),
                                       jnp.array(mask), 0.4))
    for i in range(b):
        for j in range(c):
            valid = np.nonzero(mask[i, j])[0]
            ref = nms_numpy(boxes[i, j][valid], scores[i, j][valid], 0.4)
            ref_global = set(valid[ref].tolist())
            assert set(np.nonzero(keep[i, j])[0].tolist()) == ref_global
