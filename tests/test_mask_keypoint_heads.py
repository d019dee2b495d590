"""Mask / keypoint heads: module shapes, loss protocol vs torch oracles,
target projection on analytic rectangles, Masker paste semantics.

The reference's mask-loss target chain needs pycocotools (absent here —
structures/masks.py docstring), so mask targets are validated on
axis-aligned rectangles where the analytic raster is exact, and the BCE /
CE reductions are validated against torch.nn.functional directly (the
same functions the reference losses call, loss.py:124-126 / 168-169).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odwscl_tpu.models.mask_head import (MaskHead, crop_resize_bitmasks,
                                         mask_rcnn_loss, mask_head_targets,
                                         select_class_masks, Masker)
from odwscl_tpu.models.keypoint_head import (KeypointHead,
                                             keypoint_rcnn_loss,
                                             heatmaps_to_keypoints)
from odwscl_tpu.structures import keypoints_to_heatmap


def test_mask_head_shapes_and_param_names():
    head = MaskHead(num_classes=21, conv_layers=(32, 32),
                    compute_dtype=jnp.float32)
    x = jnp.zeros((3, 14, 14, 64))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (3, 28, 28, 21)
    p = params["params"]
    assert set(p["extractor"].keys()) == {"mask_fcn1", "mask_fcn2"}
    assert set(p["predictor"].keys()) == {"conv5_mask", "mask_fcn_logits"}


def test_crop_resize_bitmasks_rectangle_exact():
    # a filled rectangle raster crop-resized INSIDE the rectangle is all 1
    bm = np.zeros((1, 32, 40), np.float32)
    bm[0, 4:20, 6:30] = 1.0
    tgt = crop_resize_bitmasks(jnp.asarray(bm), jnp.zeros((2,), jnp.int32),
                               jnp.asarray([[8.0, 6.0, 28.0, 18.0],
                                            [6.0, 4.0, 30.0, 20.0]]), 8)
    assert tgt.shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(tgt[0]), 1.0)
    # the second box is exactly the rectangle: interior cells are 1
    np.testing.assert_allclose(np.asarray(tgt[1][2:6, 2:6]), 1.0)


def test_mask_rcnn_loss_matches_torch_bce():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    n, m, c = 6, 7, 5
    logits = rng.randn(n, m, m, c).astype(np.float32)
    labels = rng.randint(0, c, n)
    targets = (rng.rand(n, m, m) > 0.5).astype(np.float32)
    pos = (labels > 0).astype(np.float32)

    ours = float(mask_rcnn_loss(jnp.asarray(logits), jnp.asarray(labels),
                                jnp.asarray(targets * pos[:, None, None]),
                                jnp.asarray(pos)))
    pi = np.nonzero(labels > 0)[0]
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits[pi, :, :, labels[pi]]),
        torch.tensor(targets[pi]))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_mask_head_targets_end_to_end():
    gt_boxes = jnp.asarray([[4.0, 2.0, 20.0, 14.0],
                            [0.0, 0.0, 1.0, 1.0]])
    gt_labels = jnp.asarray([3, 0])
    gt_mask = jnp.asarray([True, False])
    bm = np.zeros((2, 24, 32), np.float32)
    bm[0, 2:15, 4:21] = 1.0
    props = jnp.asarray([[4.0, 2.0, 20.0, 14.0],     # IoU 1 -> fg
                         [22.0, 16.0, 30.0, 22.0],   # IoU 0 -> bg
                         [0.0, 0.0, 0.0, 0.0]])      # padded
    pmask = jnp.asarray([True, True, False])
    labels, targets, pos = mask_head_targets(
        props, pmask, gt_boxes, gt_labels, gt_mask, jnp.asarray(bm),
        m=8, fg_iou=0.5, bg_iou=0.3)
    np.testing.assert_array_equal(np.asarray(labels), [3, 0, 0])
    np.testing.assert_array_equal(np.asarray(pos), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(targets[0]).mean(), 1.0,
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(targets[1]), 0.0)


def test_masker_paste_rectangle():
    # a solid-probability mask pasted into a box covers the box extent
    mask = np.ones((8, 8), np.float32)
    out = Masker()(mask[None], np.asarray([[5.0, 3.0, 14.0, 10.0]]),
                   im_h=20, im_w=24)
    assert out.shape == (1, 20, 24)
    assert out[0, 5:9, 7:13].all()          # interior definitely covered
    assert not out[0, :2].any() and not out[0, :, :3].any()
    sel = select_class_masks(np.stack([np.stack([mask * 0, mask], -1)]),
                             np.asarray([1]))
    np.testing.assert_allclose(sel[0], mask)


def test_keypoint_head_shapes():
    head = KeypointHead(num_keypoints=17, conv_layers=(32, 32),
                        compute_dtype=jnp.float32)
    x = jnp.zeros((2, 14, 14, 64))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 56, 56, 17)
    assert set(params["params"]["extractor"].keys()) == {"conv_fcn1",
                                                         "conv_fcn2"}


def test_keypoint_loss_matches_torch_ce():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    n, h, k = 4, 14, 17
    logits = rng.randn(n, h, h, k).astype(np.float32)
    rois = np.array([[0, 0, 20, 20], [5, 5, 30, 40],
                     [0, 0, 10, 10], [2, 2, 4, 4]], np.float32)
    kps = rng.rand(n, k, 3).astype(np.float32) * 35
    kps[..., 2] = (kps[..., 2] > 15).astype(np.float32)

    hm, valid = keypoints_to_heatmap(jnp.asarray(kps), jnp.asarray(rois), h)
    ours = float(keypoint_rcnn_loss(jnp.asarray(logits), hm, valid))

    # the reference computes F.cross_entropy over flattened [N*K, H*H]
    # logits at the valid entries (loss.py:165-169)
    lg = torch.tensor(logits).permute(0, 3, 1, 2).reshape(n * k, h * h)
    tgt = torch.tensor(np.asarray(hm).reshape(-1), dtype=torch.long)
    vmask = torch.tensor(np.asarray(valid).reshape(-1) > 0)
    ref = F.cross_entropy(lg[vmask], tgt[vmask])
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_heatmaps_to_keypoints_peak_decoding():
    # a 14x14 roi makes the cv2 resize an identity: a single hot cell
    # decodes to exactly that cell's center (Heckbert d+0.5) in roi coords
    maps = np.full((1, 14, 14, 2), -5.0, np.float32)
    maps[0, 3, 9, 0] = 5.0
    maps[0, 11, 2, 1] = 4.0
    rois = np.array([[10.0, 20.0, 24.0, 34.0]], np.float32)  # 14x14 roi
    xy, scores = heatmaps_to_keypoints(maps, rois)
    assert xy.shape == (1, 2, 3)
    np.testing.assert_allclose(xy[0, 0, :2], [10 + 9.5, 20 + 3.5])
    np.testing.assert_allclose(xy[0, 1, :2], [10 + 2.5, 20 + 11.5])
    np.testing.assert_allclose(scores[0], [5.0, 4.0])
