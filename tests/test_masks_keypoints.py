"""Mask/keypoint structures vs the EXECUTED reference containers.

The polygon/keypoint geometry ops (transpose/crop/resize coordinate math)
are compared against wetectron/structures/segmentation_mask.py and
keypoint.py run directly on cpu torch. Rasterization is NOT compared to
pycocotools (absent in this env — masks.py docstring); instead
axis-aligned rectangles give analytically exact rasters.
"""

import numpy as np
import pytest

from odwscl_tpu.structures import (Masks, PolygonMasks, PolygonInstance,
                                   BinaryMasks, Keypoints, PersonKeypoints,
                                   Click, keypoints_to_heatmap,
                                   FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM)


def _ref_polygons():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.structures.segmentation_mask import PolygonInstance as RP
    return RP


POLY = [[10.0, 5.0, 40.0, 5.0, 40.0, 25.0, 10.0, 25.0],
        [2.0, 2.0, 8.0, 2.0, 5.0, 9.0]]
SIZE = (64, 48)  # (w, h)


def test_polygon_transpose_crop_resize_match_reference():
    RP = _ref_polygons()
    ours = PolygonInstance(POLY, SIZE)
    ref = RP(POLY, SIZE)

    for method in (FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM):
        a = ours.transpose(method)
        b = ref.transpose(method)
        for pa, pb in zip(a.polygons, b.polygons):
            np.testing.assert_allclose(pa, pb.numpy(), rtol=1e-6)

    box = [5.0, 3.0, 50.0, 30.0]
    a = ours.crop(box)
    b = ref.crop(box)
    assert a.size == tuple(b.size)
    for pa, pb in zip(a.polygons, b.polygons):
        np.testing.assert_allclose(pa, pb.numpy(), rtol=1e-6)

    a = ours.resize((32, 96))
    b = ref.resize((32, 96))
    for pa, pb in zip(a.polygons, b.polygons):
        np.testing.assert_allclose(pa, pb.numpy(), rtol=1e-6)


def test_rectangle_rasterization_exact():
    # PIL polygon fill includes the outline: a rect polygon with corners
    # (x0,y0)..(x1,y1) covers integer pixels x0..x1, y0..y1 inclusive
    m = PolygonInstance([[3, 2, 8, 2, 8, 6, 3, 6]], (12, 10)).to_bitmask()
    want = np.zeros((10, 12), np.uint8)
    want[2:7, 3:9] = 1
    np.testing.assert_array_equal(m, want)


def test_binary_masks_ops():
    rng = np.random.RandomState(0)
    m = (rng.rand(3, 10, 12) > 0.5).astype(np.float32)
    bm = BinaryMasks(m, (12, 10))
    np.testing.assert_array_equal(
        bm.transpose(FLIP_LEFT_RIGHT).masks, m[:, :, ::-1])
    np.testing.assert_array_equal(
        bm.transpose(FLIP_TOP_BOTTOM).masks, m[:, ::-1, :])
    c = bm.crop([2, 1, 8, 7])
    assert c.size == (6, 6) and c.masks.shape == (3, 6, 6)
    np.testing.assert_array_equal(c.masks, m[:, 1:7, 2:8])
    r = bm.resize((24, 20))
    assert r.masks.shape == (3, 20, 24)
    # bilinear resize of a constant mask stays constant
    const = BinaryMasks(np.ones((1, 4, 4), np.float32), (4, 4))
    np.testing.assert_allclose(const.resize((9, 7)).masks, 1.0)


def test_masks_facade_modes_and_getitem():
    pm = Masks([POLY], SIZE, mode="poly")
    assert len(pm) == 1
    bit = pm.to_bitmasks()
    assert bit.shape == (1, SIZE[1], SIZE[0])
    bm = Masks(bit, SIZE, mode="mask")
    assert len(bm) == 1
    np.testing.assert_array_equal(bm.to_bitmasks(), bit)
    sel = PolygonMasks([POLY, POLY], SIZE)[np.array([1])]
    assert len(sel) == 1


def test_keypoints_resize_flip_match_reference():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.structures.keypoint import PersonKeypoints as RefPK
    import torch

    rng = np.random.RandomState(1)
    kp = rng.rand(2, 17, 3).astype(np.float32) * 40
    kp[..., 2] = (kp[..., 2] > 20).astype(np.float32) * 2
    ours = PersonKeypoints(kp, SIZE)
    ref = RefPK(torch.tensor(kp), SIZE)

    a = ours.resize((32, 96)).keypoints
    b = ref.resize((32, 96)).keypoints.numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5)

    a = ours.transpose(FLIP_LEFT_RIGHT).keypoints
    b = ref.transpose(FLIP_LEFT_RIGHT).keypoints.numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_click_flip_matches_reference():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.structures.keypoint import Click as RefClick
    import torch

    kp = np.array([[[5.0, 7.0, 1.0]], [[20.0, 3.0, 1.0]]], np.float32)
    ours = Click(kp, SIZE).transpose(FLIP_LEFT_RIGHT).keypoints
    ref = RefClick(torch.tensor(kp), SIZE).transpose(
        FLIP_LEFT_RIGHT).keypoints.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_keypoints_to_heatmap_matches_reference():
    import wetectron_shims
    wetectron_shims.install()
    from wetectron.structures.keypoint import keypoints_to_heat_map
    import torch
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    rois = np.array([[2.0, 3.0, 30.0, 40.0], [0.0, 0.0, 10.0, 10.0]],
                    np.float32)
    kp = rng.rand(2, 17, 3).astype(np.float32) * 45
    kp[..., 2] = (kp[..., 2] > 22).astype(np.float32)
    # exercise the boundary-snap branch (x == roi x2)
    kp[0, 0, 0] = 30.0
    kp[0, 0, 2] = 1.0

    ref_hm, ref_valid = keypoints_to_heat_map(
        torch.tensor(kp), torch.tensor(rois), 14)
    hm, valid = keypoints_to_heatmap(jnp.asarray(kp), jnp.asarray(rois), 14)
    np.testing.assert_array_equal(np.asarray(valid), ref_valid.numpy())
    np.testing.assert_array_equal(np.asarray(hm), ref_hm.numpy())
