"""Golden tests for the pure-python COCO RLE codec (structures/rle.py).

The compressed-string goldens are hand-computed from the pycocotools
wire format (rleToString/rleFrString in maskApi.c): base-32 varints with
+48 ASCII offset, continuation bit 0x20, sign bit 0x10 on the final
chunk, and order-2 delta coding from the third count on. VERDICT r4
task 7 (ref segmentation_mask.py:40-75 ingests these via pycocotools).
"""

import numpy as np
import pytest

from odwscl_tpu.structures.rle import (
    _counts_from_string, _counts_to_string, is_rle, rasterize_segmentation,
    rle_decode, rle_encode)


def test_uncompressed_column_major_decode():
    # size [h=2, w=3]: column-major flat runs 0x1, 1x3, 0x2
    rle = {"size": [2, 3], "counts": [1, 3, 2]}
    m = rle_decode(rle)
    # flat (F-order) = [0,1, 1,1, 0,0] -> columns [[0,1],[1,1],[0,0]]
    expect = np.array([[0, 1, 0],
                       [1, 1, 0]], np.uint8)
    np.testing.assert_array_equal(m, expect)


def test_compressed_string_hand_golden_small():
    # counts [1, 2] for a [1,3] mask [0,1,1]:
    #   1 -> single chunk 0b00001 -> chr(1+48) = '1'
    #   2 -> single chunk 0b00010 -> chr(2+48) = '2'
    assert _counts_to_string([1, 2]) == "12"
    assert _counts_from_string("12") == [1, 2]
    m = rle_decode({"size": [1, 3], "counts": "12"})
    np.testing.assert_array_equal(m, np.array([[0, 1, 1]], np.uint8))


def test_compressed_string_hand_golden_multichunk():
    # 100 = 0b1100100: low chunk 0b00100=4 (cont -> +0x20+48 = 'T'),
    # high chunk 0b00011=3, but 3 has bit 0x10 clear so it terminates:
    # chars: chr(4+32+48)='T', chr(3+48)='3'
    assert _counts_to_string([100]) == "T3"
    assert _counts_from_string("T3") == [100]


def test_compressed_delta_coding_third_count_on():
    # counts [2, 3, 4, 5, 6]: stored values are
    # [2, 3, 4, 5-3=2, 6-4=2] (delta vs two back, from index 3)
    s = _counts_to_string([2, 3, 4, 5, 6])
    assert s == "23422"
    assert _counts_from_string(s) == [2, 3, 4, 5, 6]


def test_negative_delta_sign_extension():
    # counts [10, 1, 10, 1]: index-3 stores 1-1=0; index... make a real
    # negative: [10, 5, 3, 1] -> stored [10, 5, 3, 1-5=-4].
    # -4 = ...11100 -> chunk 0b11100 = 28, sign bit 0x10 set, terminates:
    # chr(28+48)='\\' -- just round-trip it
    s = _counts_to_string([10, 5, 3, 1])
    assert _counts_from_string(s) == [10, 5, 3, 1]


def test_roundtrip_random_masks():
    rng = np.random.RandomState(0)
    for h, w in [(1, 1), (7, 5), (31, 17), (64, 48)]:
        m = (rng.rand(h, w) > 0.6).astype(np.uint8)
        rle = rle_encode(m)
        assert is_rle(rle)
        np.testing.assert_array_equal(rle_decode(rle), m)


def test_roundtrip_all_zero_all_one():
    z = np.zeros((4, 6), np.uint8)
    o = np.ones((4, 6), np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(z)), z)
    np.testing.assert_array_equal(rle_decode(rle_encode(o)), o)


def test_counts_sum_mismatch_raises():
    with pytest.raises(ValueError):
        rle_decode({"size": [2, 2], "counts": [1, 1]})


def test_rasterize_segmentation_dispatch():
    # RLE branch
    m = np.zeros((5, 4), np.uint8)
    m[1:3, 2:4] = 1
    seg = rle_encode(m)
    np.testing.assert_array_equal(rasterize_segmentation(seg, 5, 4), m)
    with pytest.raises(ValueError):
        rasterize_segmentation(seg, 6, 4)  # size mismatch fails loudly
    # polygon branch: axis-aligned rectangle is exact (masks.py contract)
    poly = [[1.0, 1.0, 3.0, 1.0, 3.0, 3.0, 1.0, 3.0]]
    r = rasterize_segmentation(poly, 5, 4)
    assert r[2, 2] == 1 and r[0, 0] == 0


def test_binary_masks_accept_rle_dicts():
    from odwscl_tpu.structures.masks import BinaryMasks, Masks
    m0 = np.zeros((6, 8), np.uint8)
    m0[2:5, 1:7] = 1
    m1 = np.zeros((6, 8), np.uint8)
    m1[0:2, 0:3] = 1
    bm = BinaryMasks([rle_encode(m0), rle_encode(m1)], (8, 6))
    np.testing.assert_array_equal(bm.to_bitmasks(),
                                  np.stack([m0, m1]))
    mk = Masks([rle_encode(m0)], (8, 6), mode="mask")
    np.testing.assert_array_equal(mk.to_bitmasks(), m0[None])


def test_uncompressed_and_compressed_agree():
    rng = np.random.RandomState(3)
    m = (rng.rand(9, 13) > 0.5).astype(np.uint8)
    comp = rle_encode(m)
    unc = {"size": comp["size"],
           "counts": _counts_from_string(comp["counts"])}
    np.testing.assert_array_equal(rle_decode(unc), rle_decode(comp))
