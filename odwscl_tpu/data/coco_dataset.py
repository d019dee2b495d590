"""COCO dataset with precomputed proposals.

Reference: wetectron/data/datasets/coco.py:60-197. pycocotools is not a
dependency here; a minimal JSON-backed index (`MiniCOCO`) provides the
pieces the pipeline needs (images, annotations, contiguous category ids).
Proposal handling matches VOC's but with ``min_size=2`` (coco.py:120).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Optional

import numpy as np
from PIL import Image

from .transforms import Sample
from .proposals import ProposalStore


class MiniCOCO:
    """Tiny subset of the pycocotools COCO API backed by plain json."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.dataset = data
        self.imgs = {im["id"]: im for im in data.get("images", [])}
        self.cats = {c["id"]: c for c in data.get("categories", [])}
        self.img_to_anns = defaultdict(list)
        self.anns = {}
        for ann in data.get("annotations", []):
            self.img_to_anns[ann["image_id"]].append(ann)
            self.anns[ann["id"]] = ann

    def getImgIds(self):
        return sorted(self.imgs.keys())

    def getCatIds(self):
        return sorted(self.cats.keys())

    def loadImgs(self, ids):
        if isinstance(ids, int):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def loadAnns(self, ids):
        return [self.anns[i] for i in ids]


class COCODataset:
    """load_masks/load_keypoints: MODEL.MASK_ON / KEYPOINT_ON plumb the
    annotations' "segmentation" (polygon lists or RLE dicts, reference
    coco.py:95-104 via SegmentationMask) and "keypoints" (coco.py:106-110
    via PersonKeypoints) into the Sample; the collator rasterizes/pads
    them into Batch.gt_bitmasks / gt_keypoints."""

    def __init__(self, ann_file: str, img_dir: str,
                 remove_images_without_annotations: bool = True,
                 proposal_file: Optional[str] = None, min_size: float = 2.0,
                 load_masks: bool = False, load_keypoints: bool = False):
        self.coco = MiniCOCO(ann_file)
        self.root = img_dir
        ids = self.coco.getImgIds()
        if remove_images_without_annotations:
            ids = [i for i in ids if any(
                ann.get("iscrowd", 0) == 0 for ann in self.coco.img_to_anns[i])]
        self.ids = ids
        # contiguous category ids (coco.py:74-80): json id -> [1..C-1]
        self.json_category_id_to_contiguous_id = {
            v: i + 1 for i, v in enumerate(self.coco.getCatIds())}
        self.contiguous_category_id_to_json_id = {
            v: k for k, v in self.json_category_id_to_contiguous_id.items()}
        self.id_to_img_map = dict(enumerate(self.ids))
        self.categories = {c["id"]: c["name"] for c in self.coco.cats.values()}
        self.proposals = (ProposalStore(proposal_file, min_size=min_size)
                          if proposal_file else None)
        self.load_masks = load_masks
        self.load_keypoints = load_keypoints

    def __len__(self):
        return len(self.ids)

    def get_origin_id(self, index):
        return self.ids[index]

    def get_img_info(self, index):
        im = self.coco.imgs[self.ids[index]]
        return {"height": im["height"], "width": im["width"],
                "file_name": im["file_name"]}

    def get_groundtruth(self, index):
        img_id = self.ids[index]
        anns = [a for a in self.coco.img_to_anns[img_id]
                if a.get("iscrowd", 0) == 0]
        boxes, labels = [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            # xywh -> xyxy with TO_REMOVE (bounding_box.py convert)
            boxes.append([x, y, x + max(w - 1, 0), y + max(h - 1, 0)])
            labels.append(self.json_category_id_to_contiguous_id[a["category_id"]])
        return (np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(labels, np.int64),
                np.zeros(len(labels), bool))

    def __getitem__(self, index) -> Sample:
        img_id = self.ids[index]
        info = self.coco.imgs[img_id]
        img = Image.open(os.path.join(self.root, info["file_name"])).convert("RGB")
        gt_boxes, gt_labels, gt_diff = self.get_groundtruth(index)
        w, h = img.size
        gt_boxes[:, 0::2] = gt_boxes[:, 0::2].clip(0, w - 1)
        gt_boxes[:, 1::2] = gt_boxes[:, 1::2].clip(0, h - 1)
        rois = (self.proposals.get(int(img_id), img.size)
                if self.proposals is not None else None)

        # partial-label supervision fields (reference coco.py:155-172):
        # per-annotation 'point' [x, y] clicks and 'scribble' polylines
        # (reduced to their bounding box; empty -> the [1,2,3,4] sentinel)
        anns = [a for a in self.coco.img_to_anns[img_id]
                if a.get("iscrowd", 0) == 0]
        clicks = click_labels = scribbles = scribble_labels = None
        if anns and "point" in anns[0]:
            clicks = np.asarray([a["point"][:2] for a in anns],
                                np.float32).reshape(-1, 2)
            click_labels = np.asarray(
                [self.json_category_id_to_contiguous_id[a["category_id"]]
                 for a in anns], np.int64)
        if anns and "scribble" in anns[0]:
            sb = []
            for a in anns:
                sc = a["scribble"]
                if len(sc[0]) == 0:
                    sb.append([1.0, 2.0, 3.0, 4.0])  # coco.py:166 sentinel
                else:
                    sb.append([min(sc[0]), min(sc[1]), max(sc[0]), max(sc[1])])
            scribbles = np.asarray(sb, np.float32).reshape(-1, 4)
            scribble_labels = np.asarray(
                [self.json_category_id_to_contiguous_id[a["category_id"]]
                 for a in anns], np.int64)

        # supervised instance annotations (reference coco.py:95-115)
        gt_masks = gt_keypoints = None
        if self.load_masks:
            from ..structures.masks import Masks
            from ..structures.rle import is_rle, rle_decode
            segs = [a.get("segmentation") or [] for a in anns]
            if any(is_rle(s) for s in segs):
                # mixed polygon/RLE images decode everything to rasters
                from ..structures.masks import rasterize_polygons
                bit = [rle_decode(s) if is_rle(s) else rasterize_polygons(
                    [np.asarray(p, np.float64) for p in s], h, w)
                    for s in segs]
                gt_masks = Masks(np.stack(bit) if bit else
                                 np.zeros((0, h, w)), (w, h), mode="mask")
            else:
                gt_masks = Masks(segs, (w, h), mode="poly")
        if self.load_keypoints:
            from ..structures.keypoints import PersonKeypoints
            kps = [a.get("keypoints", []) for a in anns]
            k = max((len(x) // 3 for x in kps), default=17) or 17
            arr = np.zeros((len(kps), k, 3), np.float32)
            for i, x in enumerate(kps):
                if x:
                    arr[i] = np.asarray(x, np.float32).reshape(-1, 3)[:k]
            gt_keypoints = PersonKeypoints(arr, (w, h))

        return Sample(image=img, size=img.size, gt_boxes=gt_boxes,
                      gt_labels=gt_labels, gt_difficult=gt_diff, rois=rois,
                      image_id=index, clicks=clicks,
                      click_labels=click_labels, scribbles=scribbles,
                      scribble_labels=scribble_labels,
                      gt_masks=gt_masks, gt_keypoints=gt_keypoints)

    def map_class_id_to_class_name(self, class_id):
        json_id = self.contiguous_category_id_to_json_id.get(class_id)
        return self.categories.get(json_id, str(class_id))
