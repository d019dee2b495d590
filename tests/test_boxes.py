"""Golden tests for box geometry against the reference formulas
(reference boxlist_ops.py / box_coder.py, recomputed independently here)."""

import numpy as np
import jax.numpy as jnp

from odwscl_tpu.structures import (box_area, box_iou, box_iou_async, encode_boxes,
                                   decode_boxes, clip_to_image,
                                   remove_small_boxes_mask, flip_boxes_horizontal)


def test_area_plus_one_convention():
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    assert float(box_area(boxes)[0]) == 10.0 * 20.0


def test_iou_plus_one_convention():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[5.0, 5.0, 14.0, 14.0]])
    # intersection (+1): (9-5+1)^2 = 25; union = 100+100-25
    iou = box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[25.0 / 175.0]], rtol=1e-6)


def test_iou_identical():
    a = jnp.array([[3.0, 4.0, 10.0, 12.0]])
    np.testing.assert_allclose(np.asarray(box_iou(a, a)), [[1.0]], rtol=1e-6)


def test_iou_async_over_area1():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[0.0, 0.0, 4.0, 9.0]])
    ioa = box_iou_async(a, b)
    np.testing.assert_allclose(np.asarray(ioa), [[50.0 / 100.0]], rtol=1e-5)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    x1y1 = rng.uniform(0, 100, (32, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (32, 2)).astype(np.float32)
    gt = np.concatenate([x1y1, x1y1 + wh], axis=1)
    px1y1 = rng.uniform(0, 100, (32, 2)).astype(np.float32)
    pwh = rng.uniform(5, 80, (32, 2)).astype(np.float32)
    props = np.concatenate([px1y1, px1y1 + pwh], axis=1)

    codes = encode_boxes(jnp.array(gt), jnp.array(props))
    dec = decode_boxes(codes, jnp.array(props))
    # the +1 widths in encode cancel the deliberate -1 on x2/y2 in decode
    # (box_coder.py:91-93): the roundtrip is exact
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-2)


def test_encode_matches_reference_formula():
    # hand-computed: proposal (0,0,9,19) => w=10,h=20,cx=4.5,cy=9.5
    # gt (2,4,11,23) => w=10,h=20,cx=6.5,cy=13.5
    codes = encode_boxes(jnp.array([[2.0, 4.0, 11.0, 23.0]]),
                         jnp.array([[0.0, 0.0, 9.0, 19.0]]))
    np.testing.assert_allclose(
        np.asarray(codes[0]),
        [10 * 2.0 / 10, 10 * 4.0 / 20, 0.0, 0.0], atol=1e-5)


def test_clip_and_small_boxes():
    boxes = jnp.array([[-5.0, -5.0, 200.0, 50.0], [0.0, 0.0, 3.0, 100.0]])
    clipped = clip_to_image(boxes, jnp.array([100.0, 150.0]))
    np.testing.assert_allclose(np.asarray(clipped[0]), [0, 0, 149, 50])
    keep = remove_small_boxes_mask(clipped, 20)
    assert bool(keep[0]) and not bool(keep[1])


def test_hflip():
    boxes = jnp.array([[10.0, 5.0, 30.0, 25.0]])
    flipped = flip_boxes_horizontal(boxes, 100.0)
    np.testing.assert_allclose(np.asarray(flipped[0]), [100 - 1 - 30, 5, 100 - 1 - 10, 25])
