"""RetinaNet: anchors vs the executed Detectron-v1 reference math, head
geometry/sharing, target + loss protocol, decode round-trip.

The module is dead in every shipped WSOD config (models/retinanet.py
docstring) — completeness port. The reference's in-tree grid_anchors was
hijacked by the CAM hack, so the dense-grid expectation is constructed
from the classic shifts formula its commented-out lines preserve.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.models.retinanet import (cell_anchors, grid_anchors,
                                         pyramid_anchors, RetinaNetHead,
                                         flatten_head_outputs,
                                         retinanet_targets, retinanet_loss,
                                         retinanet_decode, REG_WEIGHTS)
from odwscl_tpu.structures.boxes import encode_boxes


def test_cell_anchors_match_reference_generate_anchors():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.modeling.rpn.anchor_generator import generate_anchors

    # the retinanet builder feeds per-level octave scales
    # (make_anchor_generator_retinanet): 32 * 2^{0,1/3,2/3} at stride 8
    sizes = tuple(32 * 2.0 ** (i / 3) for i in range(3))
    ref = generate_anchors(8, sizes, (0.5, 1.0, 2.0)).numpy()
    ours = cell_anchors(8, 32, (0.5, 1.0, 2.0), 2.0, 3)
    # same SET of anchors (enumeration order is ratio-major on both sides)
    np.testing.assert_allclose(np.sort(ours, axis=0),
                               np.sort(ref, axis=0), rtol=1e-6)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_grid_anchors_dense_shifts():
    cell = cell_anchors(16, 64, (1.0,), 2.0, 1)      # one anchor per cell
    g = np.asarray(grid_anchors(cell, 16, 2, 3))
    assert g.shape == (6, 4)
    # row-major grid: anchor (y, x) = cell + (16x, 16y)
    np.testing.assert_allclose(g[0], cell[0])
    np.testing.assert_allclose(g[1], cell[0] + [16, 0, 16, 0])
    np.testing.assert_allclose(g[3], cell[0] + [0, 16, 0, 16])
    levels = pyramid_anchors([(4, 6), (2, 3)], strides=(8, 16),
                             sizes=(32, 64))
    assert levels[0].shape == (4 * 6 * 9, 4)
    assert levels[1].shape == (2 * 3 * 9, 4)


def test_head_shapes_sharing_and_prior_bias():
    head = RetinaNetHead(num_classes=21, num_anchors=9, num_convs=2,
                         compute_dtype=jnp.float32)
    feats = [jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 32))]
    params = head.init(jax.random.PRNGKey(0), feats)
    logits, bbox = head.apply(params, feats)
    assert logits[0].shape == (1, 8, 8, 9 * 20)
    assert bbox[1].shape == (1, 4, 4, 9 * 4)
    # towers shared across levels: exactly one parameter set exists
    names = set(params["params"].keys())
    assert names == {"cls_tower0", "cls_tower1", "bbox_tower0",
                     "bbox_tower1", "cls_logits", "bbox_pred"}
    # prior-prob bias init (retinanet.py:75-77)
    want = -math.log((1 - 0.01) / 0.01)
    np.testing.assert_allclose(params["params"]["cls_logits"]["bias"],
                               want, rtol=1e-6)
    fl, fb = flatten_head_outputs(logits, bbox, 20)
    assert fl.shape == (1, (64 + 16) * 9, 20) and fb.shape == (1, 720, 4)


def test_targets_labels_and_discard():
    anchors = jnp.asarray([[0, 0, 10, 10],      # IoU 1 with gt0 -> fg
                           [0, 0, 13, 10],      # IoU ~0.79 -> fg
                           [0, 0, 24, 24],      # IoU ~0.2 -> bg
                           [2, 2, 12, 13]],     # IoU ~0.45 -> discard
                          jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    labels, reg = retinanet_targets(anchors, gt, jnp.asarray([7]),
                                    jnp.asarray([True]), 0.5, 0.4)
    np.testing.assert_array_equal(np.asarray(labels), [7, 7, 0, -1])
    want = np.asarray(encode_boxes(gt[0], anchors[0], REG_WEIGHTS))
    np.testing.assert_allclose(np.asarray(reg[0]), want, rtol=1e-6)


def test_loss_normalization_protocol():
    # 1 image, 3 anchors, 2 fg classes; labels: one pos, one bg, one discard
    logits = jnp.zeros((1, 3, 2))
    labels = jnp.asarray([[1, 0, -1]])
    bbox = jnp.ones((1, 3, 4)) * 0.5
    regt = jnp.zeros((1, 3, 4))
    cls, reg = retinanet_loss(logits, bbox, labels, regt,
                              beta=0.11, reg_norm=4.0)
    # focal at logit 0: p=.5; pos term = alpha*(.5^g)*log(.5) per pos
    # entry; neg = (1-alpha)*(.5^g)*log(.5) per valid-neg entry. Anchor 0:
    # 1 pos + 1 neg column; anchor 1: 2 neg; anchor 2 discarded.
    l = -0.25 * 0.25 * math.log(0.5), -0.75 * 0.25 * math.log(0.5)
    want_cls = (l[0] + 3 * l[1]) / (1 + 1)          # / (npos + N)
    np.testing.assert_allclose(float(cls), want_cls, rtol=1e-5)
    # smooth l1 at |d|=0.5 >= beta: (0.5 - beta/2) * 4 coords * 1 pos / 4
    want_reg = (0.5 - 0.055) * 4 / 4.0
    np.testing.assert_allclose(float(reg), want_reg, rtol=1e-5)


def test_decode_roundtrip_and_topk():
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(
        np.concatenate([rng.uniform(0, 300, (20, 2)),
                        rng.uniform(320, 600, (20, 2))], -1), jnp.float32)
    gt = anchors + jnp.asarray([5.0, -3.0, 9.0, 2.0])
    reg = encode_boxes(gt, anchors, REG_WEIGHTS)[None]        # [1,20,4]
    logits = jnp.full((1, 20, 3), -8.0)
    logits = logits.at[0, 4, 1].set(3.0)      # one confident det, class 2
    boxes, scores, labels, valid = retinanet_decode(
        anchors, logits, reg, jnp.asarray([[700.0, 700.0]]),
        score_thresh=0.05, pre_nms_top_n=10)
    assert boxes.shape == (1, 10, 4)
    assert bool(valid[0, 0]) and int(labels[0, 0]) == 2
    np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                               np.asarray(gt[4]), rtol=1e-4, atol=1e-2)
    # only one entry above threshold
    assert int(valid.sum()) == 1
