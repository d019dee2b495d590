"""Supervised GT data plumbing: COCO segmentation/keypoints -> Sample ->
transforms -> padded Batch (VERDICT r4 task 2; reference data/datasets/
coco.py:95-115 + the target BoxList fields).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from odwscl_tpu.data.coco_dataset import COCODataset
from odwscl_tpu.data.transforms import EvalTransform, hflip, resize, to_array
from odwscl_tpu.data.collate import BatchCollator


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "imgs"
    img_dir.mkdir()
    h, w = 60, 80
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(img_dir / "1.jpg")
    # instance 1: rectangle polygon; instance 2: uncompressed RLE strip
    anns = [
        {"id": 1, "image_id": 1, "category_id": 5,
         "bbox": [10.0, 20.0, 30.0, 20.0], "area": 600.0, "iscrowd": 0,
         "segmentation": [[10, 20, 39, 20, 39, 39, 10, 39]],
         "keypoints": [15, 25, 2, 0, 0, 0] + [0, 0, 0] * 15,
         "num_keypoints": 1},
        {"id": 2, "image_id": 1, "category_id": 3,
         "bbox": [0.0, 0.0, 5.0, 60.0], "area": 300.0, "iscrowd": 0,
         # column-major runs: first 5 columns (5*60=300 px) set
         "segmentation": {"size": [60, 80], "counts": [0, 300, 60 * 80 - 300]},
         "keypoints": [2, 30, 2, 0, 0, 0] + [0, 0, 0] * 15,
         "num_keypoints": 1},
    ]
    data = {"images": [{"id": 1, "file_name": "1.jpg",
                        "height": h, "width": w}],
            "annotations": anns,
            "categories": [{"id": i, "name": f"c{i}"} for i in range(1, 7)]}
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(data))
    return str(ann_file), str(img_dir)


def test_coco_parses_masks_and_keypoints(coco_root):
    ann, imgs = coco_root
    ds = COCODataset(ann, imgs, load_masks=True, load_keypoints=True)
    s = ds[0]
    assert len(s.gt_masks) == 2
    bit = s.gt_masks.to_bitmasks()
    assert bit.shape == (2, 60, 80)
    # polygon rectangle is exact (masks.py docstring)
    assert bit[0, 20:40, 10:40].all() and bit[0].sum() == 600
    # RLE strip decodes column-major
    assert bit[1, :, :5].all() and bit[1].sum() == 300
    assert s.gt_keypoints.keypoints.shape == (2, 17, 3)
    assert tuple(s.gt_keypoints.keypoints[0, 0]) == (15, 25, 2)


def test_transforms_carry_gt(coco_root):
    ann, imgs = coco_root
    ds = COCODataset(ann, imgs, load_masks=True, load_keypoints=True)
    s = resize(ds[0], 30, 40)           # 60x80 -> 30x40 (w,h)=(40,30)
    assert s.gt_masks.inner.size == (40, 30)
    np.testing.assert_allclose(s.gt_keypoints.keypoints[0, 0, :2],
                               [7.5, 12.5])
    f = hflip(s)
    # nose (index 0) stays index 0 under the person flip map; x mirrored
    np.testing.assert_allclose(f.gt_keypoints.keypoints[0, 0, :2],
                               [40 - 7.5 - 1, 12.5])
    bit = f.gt_masks.to_bitmasks()
    assert bit.shape[0] == 2


def test_collator_pads_gt_and_rasterizes(coco_root):
    ann, imgs = coco_root
    ds = COCODataset(ann, imgs, load_masks=True, load_keypoints=True)
    tr = EvalTransform(60, 80, flip=False)
    sample = tr(ds[0])
    coll = BatchCollator(num_classes=7, size_divisibility=32,
                         image_pad_multiple=32, proposal_buckets=(16,),
                         include_gt=True, gt_pad=4, mask_raster_stride=2)
    batch = coll([sample])
    assert batch.gt_boxes.shape == (1, 4, 4)
    assert batch.gt_mask.sum() == 2
    assert batch.gt_labels[0, 0] == 5 and batch.gt_labels[0, 1] == 3
    ph, pw = batch.images.shape[1:3]
    assert batch.gt_bitmasks.shape == (1, 4, ph // 2, pw // 2)
    # instance 0 raster covers the box footprint at stride 2
    m0 = batch.gt_bitmasks[0, 0]
    assert m0[11:19, 6:19].mean() > 0.9
    assert batch.gt_keypoints.shape == (1, 4, 17, 3)
    # WSOD collator (include_gt=False) keeps the old Batch surface
    coll_w = BatchCollator(num_classes=7, proposal_buckets=(16,))
    assert coll_w([sample]).gt_boxes is None
