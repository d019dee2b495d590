"""Batch collation: pad-to-bucket static shapes (replaces ImageList/BoxList).

Reference: wetectron/data/collate_batch.py + structures/image_list.py:33-76.
The reference pads each batch's images to the max size rounded up to
SIZE_DIVISIBILITY (32); for XLA we additionally round up to
``image_pad_multiple`` and pad the per-image proposal count to a bucket so
the number of compiled shapes stays small (SURVEY.md section 7, decision 1).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from .transforms import Sample
from ..models.detector import Batch


def _round_up(x: int, m: int) -> int:
    return int(math.ceil(x / m) * m)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in sorted(buckets):
        if n <= b:
            return b
    return sorted(buckets)[-1]


def image_labels(gt_labels: Optional[np.ndarray], num_classes: int) -> np.ndarray:
    """generate_img_label (utils/utils.py:52-57): multi-hot, col 0 zeroed."""
    lab = np.zeros((num_classes,), np.float32)
    if gt_labels is not None and len(gt_labels):
        lab[np.unique(gt_labels).astype(np.int64)] = 1.0
    lab[0] = 0.0
    return lab


class BatchCollator:
    """list[Sample] -> Batch (static padded shapes)."""

    def __init__(self, num_classes: int, size_divisibility: int = 32,
                 image_pad_multiple: int = 128,
                 proposal_buckets: Sequence[int] = (512, 1024, 2048, 4096),
                 fixed_image_hw: Optional[tuple] = None,
                 fixed_proposals: Optional[int] = None,
                 include_gt: bool = False, gt_pad: int = 32,
                 mask_raster_stride: int = 4):
        """include_gt: pad instance GT (boxes/labels/masks/keypoints) into
        the Batch — the supervised stack (WSOD_ON=False / RETINANET_ON);
        WSOD batches carry image-level labels only. gt bitmasks are
        rasterized here at 1/mask_raster_stride of the padded canvas
        (TPU.MASK_RASTER_STRIDE; see models/mask_head.py)."""
        self.num_classes = num_classes
        self.size_div = size_divisibility
        self.image_pad_multiple = image_pad_multiple
        self.proposal_buckets = tuple(proposal_buckets)
        self.fixed_image_hw = fixed_image_hw
        self.fixed_proposals = fixed_proposals
        self.include_gt = include_gt
        self.gt_pad = gt_pad
        self.mask_raster_stride = mask_raster_stride

    def __call__(self, samples: List[Sample]) -> Batch:
        b = len(samples)
        heights = [s.image.shape[0] for s in samples]
        widths = [s.image.shape[1] for s in samples]
        if self.fixed_image_hw is not None:
            ph, pw = self.fixed_image_hw
        else:
            ph = _round_up(_round_up(max(heights), self.size_div),
                           self.image_pad_multiple)
            pw = _round_up(_round_up(max(widths), self.size_div),
                           self.image_pad_multiple)
        images = np.zeros((b, ph, pw, 3), np.float32)
        sizes = np.zeros((b, 2), np.float32)
        for i, s in enumerate(samples):
            h, w = s.image.shape[:2]
            images[i, :h, :w] = s.image
            sizes[i] = (h, w)

        counts = [0 if s.rois is None else len(s.rois) for s in samples]
        p = (self.fixed_proposals if self.fixed_proposals is not None
             else pick_bucket(max(max(counts), 1), self.proposal_buckets))
        boxes = np.zeros((b, p, 4), np.float32)
        mask = np.zeros((b, p), bool)
        truncated = 0
        for i, s in enumerate(samples):
            if s.rois is None:
                continue
            n = min(len(s.rois), p)
            truncated += max(len(s.rois) - p, 0)
            boxes[i, :n] = s.rois[:n]
            mask[i, :n] = True

        labels = np.stack([image_labels(s.gt_labels, self.num_classes)
                           for s in samples])

        # partial-label fields, padded to a fixed 32-slot cap (images rarely
        # carry more than a handful of clicks/scribbles)
        extra = {}
        if any(s.clicks is not None and len(s.clicks) for s in samples):
            k = 32
            clk = np.zeros((b, k, 2), np.float32)
            clab = np.zeros((b, k), np.int32)
            cm = np.zeros((b, k), bool)
            for i, s in enumerate(samples):
                if s.clicks is None or not len(s.clicks):
                    continue
                n = min(len(s.clicks), k)
                clk[i, :n] = s.clicks[:n]
                clab[i, :n] = s.click_labels[:n]
                cm[i, :n] = True
            extra.update(clicks=clk, click_labels=clab, click_mask=cm)
        if any(s.scribbles is not None and len(s.scribbles) for s in samples):
            k = 32
            scr = np.zeros((b, k, 4), np.float32)
            slab = np.zeros((b, k), np.int32)
            sm = np.zeros((b, k), bool)
            for i, s in enumerate(samples):
                if s.scribbles is None or not len(s.scribbles):
                    continue
                n = min(len(s.scribbles), k)
                scr[i, :n] = s.scribbles[:n]
                slab[i, :n] = s.scribble_labels[:n]
                sm[i, :n] = True
            extra.update(scribbles=scr, scribble_labels=slab,
                         scribble_mask=sm)
        if self.include_gt:
            g = self.gt_pad
            gtb = np.zeros((b, g, 4), np.float32)
            gtl = np.zeros((b, g), np.int32)
            gtm = np.zeros((b, g), bool)
            for i, s in enumerate(samples):
                if s.gt_boxes is None or not len(s.gt_boxes):
                    continue
                n = min(len(s.gt_boxes), g)
                gtb[i, :n] = s.gt_boxes[:n]
                gtl[i, :n] = s.gt_labels[:n]
                gtm[i, :n] = True
            extra.update(gt_boxes=gtb, gt_labels=gtl, gt_mask=gtm)
            if any(s.gt_masks is not None for s in samples):
                st = self.mask_raster_stride
                mh, mw = ph // st, pw // st
                bit = np.zeros((b, g, mh, mw), np.float32)
                for i, s in enumerate(samples):
                    if s.gt_masks is None or not len(s.gt_masks):
                        continue
                    # rasterize at the transformed size, then stride-
                    # subsample onto the padded canvas raster (the mask
                    # lives in the image's top-left corner like the image)
                    raster = s.gt_masks.resize(
                        (s.image.shape[1] // st, s.image.shape[0] // st)
                    ).to_bitmasks().astype(np.float32)
                    n = min(len(raster), g)
                    bit[i, :n, :raster.shape[1], :raster.shape[2]] = raster[:n]
                extra.update(gt_bitmasks=bit)
            if any(s.gt_keypoints is not None for s in samples):
                k = max(s.gt_keypoints.keypoints.shape[1]
                        for s in samples if s.gt_keypoints is not None)
                kp = np.zeros((b, g, k, 3), np.float32)
                for i, s in enumerate(samples):
                    if s.gt_keypoints is None or not len(s.gt_keypoints):
                        continue
                    arr = s.gt_keypoints.keypoints
                    n = min(len(arr), g)
                    kp[i, :n, :arr.shape[1]] = arr[:n]
                extra.update(gt_keypoints=kp)
        return Batch(images=images, image_sizes=sizes, boxes=boxes,
                     box_mask=mask, labels=labels, **extra)


def collator_from_cfg(cfg) -> BatchCollator:
    return BatchCollator(
        num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
        size_divisibility=cfg.DATALOADER.SIZE_DIVISIBILITY,
        image_pad_multiple=cfg.TPU.IMAGE_PAD_MULTIPLE,
        proposal_buckets=tuple(cfg.TPU.PROPOSAL_BUCKETS),
        include_gt=(not cfg.MODEL.WSOD_ON) or cfg.MODEL.RETINANET_ON,
        gt_pad=cfg.TPU.GT_PAD,
        mask_raster_stride=cfg.TPU.MASK_RASTER_STRIDE,
    )
