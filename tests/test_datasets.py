"""Dataset + collation units: COCO partial labels, Flickr web images,
vertical flip, class_batch pairing (round 1 covered these only through the
opt-in integration test)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from odwscl_tpu.data.coco_dataset import COCODataset
from odwscl_tpu.data.flickr import WebDataset
from odwscl_tpu.data.collate import BatchCollator
from odwscl_tpu.data.transforms import Sample, hflip, vflip, resize
from odwscl_tpu.data.samplers import class_batch_pairs


def _png(path, w=40, h=30):
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (h, w, 3), np.uint8)).save(path)


@pytest.fixture
def coco_dir(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _png(img_dir / "a.png")
    _png(img_dir / "b.png")
    ann = {
        "images": [
            {"id": 1, "file_name": "a.png", "height": 30, "width": 40},
            {"id": 2, "file_name": "b.png", "height": 30, "width": 40},
        ],
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 7, "iscrowd": 0,
             "bbox": [2, 3, 10, 8], "point": [5.0, 6.0],
             "scribble": [[4.0, 6.0, 8.0], [5.0, 9.0, 7.0]]},
            {"id": 11, "image_id": 1, "category_id": 9, "iscrowd": 0,
             "bbox": [20, 10, 6, 6], "point": [22.0, 12.0],
             "scribble": [[], []]},
            {"id": 12, "image_id": 2, "category_id": 9, "iscrowd": 0,
             "bbox": [1, 1, 5, 5]},
        ],
    }
    af = tmp_path / "ann.json"
    af.write_text(json.dumps(ann))
    return str(af), str(img_dir)


def test_coco_partial_label_fields(coco_dir):
    ann_file, img_dir = coco_dir
    ds = COCODataset(ann_file, img_dir)
    s = ds[0]
    # clicks: one per annotation, labels contiguous (7->1, 9->2)
    np.testing.assert_allclose(s.clicks, [[5.0, 6.0], [22.0, 12.0]])
    np.testing.assert_array_equal(s.click_labels, [1, 2])
    # scribbles: bbox of the polyline; empty -> the [1,2,3,4] sentinel
    np.testing.assert_allclose(s.scribbles,
                               [[4.0, 5.0, 8.0, 9.0], [1, 2, 3, 4]])
    s2 = ds[1]
    assert s2.clicks is None and s2.scribbles is None


def test_coco_partial_labels_through_transforms_and_collate(coco_dir):
    ann_file, img_dir = coco_dir
    ds = COCODataset(ann_file, img_dir)
    s = ds[0]
    s = resize(s, 60, 100)          # shortest side 30 -> 60: scale 2.0
    assert s.size == (80, 60)
    np.testing.assert_allclose(s.clicks[0], [10.0, 12.0])
    s = hflip(s)
    np.testing.assert_allclose(s.clicks[0], [80 - 10.0 - 1, 12.0])
    s = vflip(s)
    h = s.size[1]
    np.testing.assert_allclose(s.clicks[0], [80 - 10.0 - 1, h - 12.0 - 1])
    # scribble stays a valid box after both flips
    assert (s.scribbles[:, 2] >= s.scribbles[:, 0]).all()
    assert (s.scribbles[:, 3] >= s.scribbles[:, 1]).all()

    s.image = np.zeros((h, 80, 3), np.float32)
    coll = BatchCollator(num_classes=3, image_pad_multiple=32,
                         proposal_buckets=(16,))
    batch = coll([s])
    assert batch.clicks.shape == (1, 32, 2)
    assert batch.click_mask.sum() == 2
    assert batch.scribbles.shape == (1, 32, 4)
    assert batch.scribble_labels[0, 0] == 1


def test_flickr_webdataset(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _png(img_dir / "w.png")
    ann = {"images": [{"id": 5, "file_name": "w.png", "height": 30,
                       "width": 40, "labels": [3, 7]}],
           "categories": [{"id": 3, "name": "x"}, {"id": 7, "name": "y"}]}
    af = tmp_path / "f.json"
    af.write_text(json.dumps(ann))
    ds = WebDataset(str(af), str(img_dir))
    assert len(ds) == 1
    s = ds[0]
    np.testing.assert_array_equal(s.gt_labels, [3, 7])
    assert s.gt_boxes.shape == (0, 4)
    assert ds.get_img_info(0)["height"] == 30


def test_class_batch_pairs_share_a_class():
    class FakeDS:
        def __init__(self):
            self.labels = [[1], [2], [1, 3], [2], [3], [1]]

        def __len__(self):
            return len(self.labels)

        def get_groundtruth(self, i):
            lab = np.asarray(self.labels[i])
            return np.zeros((len(lab), 4), np.float32), lab, None

    ds = FakeDS()
    batches = class_batch_pairs(ds, batch_size=2, epoch=0)
    assert batches, "no batches produced"
    for b in batches:
        assert len(b) == 2
        l0 = set(ds.labels[int(b[0])])
        l1 = set(ds.labels[int(b[1])])
        assert l0 & l1, (b, l0, l1)
