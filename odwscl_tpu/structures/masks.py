"""Instance segmentation mask structures (host-side data containers).

Parity target: wetectron/structures/segmentation_mask.py (575 LoC —
SegmentationMask / PolygonList / PolygonInstance / BinaryMaskList). These
are DATA-PIPELINE containers: they live on host (numpy) and only their
rasterized [N, H, W] output ever reaches the device, where mask-target
projection is a batched bilinear crop-resize (models/mask_head.py). That
split is the TPU-first redesign: the reference's per-instance
crop→resize→rasterize chains (loss.py:11-42, a documented CPU bottleneck
there) become ONE raster per instance + static-shape device sampling.

Rasterization note: the reference converts polygons via pycocotools
(frPyObjects/merge/decode, segmentation_mask.py:325-333). pycocotools is
not in this environment, so `PolygonMasks.to_bitmasks` rasterizes with
PIL's even-odd polygon fill and unions the instance's polygon groups
(the same union `mask_utils.merge` performs). Conventions can differ
from COCO's 5x-upsampled line rasterizer by boundary pixels; evaluation
is self-consistent (GT and predictions rasterize identically) and
axis-aligned-rectangle polygons are exact (tests/test_masks.py).

RLE note: COCO RLE segmentation dicts (compressed string or
uncompressed count-list) are ingested EXACTLY via the pure-python codec
in structures/rle.py (golden-tested against the pycocotools wire
format, tests/test_rle.py) — `BinaryMasks` accepts RLE dict entries
directly, matching the reference's BinaryMaskList RLE path
(segmentation_mask.py:40-75).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1


def _clip_crop_box(box, width, height):
    """The reference's crop clamping (segmentation_mask.py:271-288):
    clamp into the image, then force at least 1px extent."""
    xmin, ymin, xmax, ymax = map(float, box)
    assert xmin <= xmax and ymin <= ymax, str(box)
    xmin = min(max(xmin, 0), width - 1)
    ymin = min(max(ymin, 0), height - 1)
    xmax = min(max(xmax, 0), width)
    ymax = min(max(ymax, 0), height)
    xmax = max(xmax, xmin + 1)
    ymax = max(ymax, ymin + 1)
    return xmin, ymin, xmax, ymax


def rasterize_polygons(polygons: Sequence[np.ndarray], height: int,
                       width: int) -> np.ndarray:
    """Union of filled polygons -> uint8 [H, W]. Each entry is a flat
    [x0, y0, x1, y1, ...] array (COCO convention)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (max(int(width), 1), max(int(height), 1)), 0)
    draw = ImageDraw.Draw(img)
    for p in polygons:
        p = np.asarray(p, np.float64)
        if p.size < 6:
            continue
        draw.polygon([tuple(xy) for xy in p.reshape(-1, 2)], outline=1,
                     fill=1)
    return np.asarray(img, np.uint8)


class PolygonInstance:
    """One object instance as a set of polygons
    (ref segmentation_mask.py:206-343)."""

    def __init__(self, polygons, size):
        if isinstance(polygons, PolygonInstance):
            polygons = [p.copy() for p in polygons.polygons]
        else:
            polys = []
            for p in polygons:
                p = np.asarray(p, np.float32).reshape(-1)
                if p.size >= 6:   # at least a triangle (ref :224)
                    polys.append(p)
            polygons = polys
        self.polygons: List[np.ndarray] = polygons
        self.size = tuple(size)  # (w, h)

    def transpose(self, method):
        if method not in (FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM):
            raise NotImplementedError(
                "Only FLIP_LEFT_RIGHT and FLIP_TOP_BOTTOM implemented")
        width, height = self.size
        dim, idx = ((width, 0) if method == FLIP_LEFT_RIGHT
                    else (height, 1))
        out = []
        for poly in self.polygons:
            p = poly.copy()
            p[idx::2] = dim - poly[idx::2] - 1      # TO_REMOVE=1 (ref :265)
            out.append(p)
        return PolygonInstance(out, self.size)

    def crop(self, box):
        w0, h0 = self.size
        xmin, ymin, xmax, ymax = _clip_crop_box(box, w0, h0)
        w, h = xmax - xmin, ymax - ymin
        out = []
        for poly in self.polygons:
            p = poly.copy()
            p[0::2] = p[0::2] - xmin      # unclamped, like the ref (:293-296)
            p[1::2] = p[1::2] - ymin
            out.append(p)
        return PolygonInstance(out, (w, h))

    def resize(self, size):
        ratio_w = float(size[0]) / float(self.size[0])
        ratio_h = float(size[1]) / float(self.size[1])
        out = []
        for poly in self.polygons:
            p = poly.copy()
            p[0::2] *= ratio_w
            p[1::2] *= ratio_h
            out.append(p)
        return PolygonInstance(out, tuple(size))

    def to_bitmask(self) -> np.ndarray:
        w, h = self.size
        return rasterize_polygons(self.polygons, int(round(h)),
                                  int(round(w)))

    # ref project_masks_on_boxes crops the POLYGONS then rasterizes at MxM
    # — exact, no raster resampling (loss.py:33-38)
    def get_mask_tensor(self) -> np.ndarray:
        return self.to_bitmask()

    def __len__(self):
        return len(self.polygons)


class BinaryMasks:
    """[N, H, W] binary masks (ref BinaryMaskList, segmentation_mask.py:33).
    Resize is bilinear align_corners=False (cv2.INTER_LINEAR matches the
    reference's F.interpolate), kept float until `get_mask_tensor`."""

    def __init__(self, masks: Union[np.ndarray, list], size):
        if isinstance(masks, BinaryMasks):
            masks = masks.masks.copy()
        elif isinstance(masks, (list, tuple)):
            # entries may be COCO RLE dicts (compressed or uncompressed),
            # matching the reference's BinaryMaskList RLE ingestion
            # (segmentation_mask.py:40-75 via mask_utils.decode)
            from .rle import is_rle, rle_decode
            masks = [rle_decode(m) if is_rle(m) else np.asarray(m)
                     for m in masks]
            masks = (np.stack(masks)
                     if masks else np.zeros((0, size[1], size[0])))
        masks = np.asarray(masks)
        if masks.ndim == 2:
            masks = masks[None]
        assert masks.ndim == 3
        assert masks.shape[1] == size[1] and masks.shape[2] == size[0], (
            masks.shape, size)
        self.masks = masks
        self.size = tuple(size)

    def transpose(self, method):
        axis = 1 if method == FLIP_TOP_BOTTOM else 2
        return BinaryMasks(np.flip(self.masks, axis).copy(), self.size)

    def crop(self, box):
        # the reference ROUNDS the box then clamps (ref :118-131)
        w0, h0 = self.size
        xmin, ymin, xmax, ymax = [int(v) for v in _clip_crop_box(
            [round(float(b)) for b in box], w0, h0)]
        out = self.masks[:, ymin:ymax, xmin:xmax]
        return BinaryMasks(out, (xmax - xmin, ymax - ymin))

    def resize(self, size):
        import cv2
        width, height = int(size[0]), int(size[1])
        assert width > 0 and height > 0
        if self.masks.shape[0] == 0:
            return BinaryMasks(np.zeros((0, height, width),
                                        self.masks.dtype), (width, height))
        out = np.stack([
            cv2.resize(m.astype(np.float32), (width, height),
                       interpolation=cv2.INTER_LINEAR)
            for m in self.masks])
        return BinaryMasks(out, (width, height))

    def to_bitmasks(self) -> np.ndarray:
        return (np.asarray(self.masks, np.float32) > 0.5).astype(np.uint8)

    def get_mask_tensor(self) -> np.ndarray:
        return self.to_bitmasks().squeeze(0) if len(self) == 1 \
            else self.to_bitmasks()

    def __len__(self):
        return self.masks.shape[0]

    def __getitem__(self, index):
        sel = self.masks[np.asarray(index).reshape(-1)] \
            if not isinstance(index, (slice, list, np.ndarray)) \
            else self.masks[index]
        return BinaryMasks(sel.reshape((-1,) + self.masks.shape[1:]),
                           self.size)


class PolygonMasks:
    """All instances of one image as polygons (ref PolygonList,
    segmentation_mask.py:346-473)."""

    def __init__(self, instances, size):
        insts = []
        for inst in instances:
            if not isinstance(inst, PolygonInstance):
                inst = PolygonInstance(inst, size)
            insts.append(inst)
        self.instances: List[PolygonInstance] = insts
        self.size = tuple(size)

    def transpose(self, method):
        return PolygonMasks([i.transpose(method) for i in self.instances],
                            self.size)

    def crop(self, box):
        out = [i.crop(box) for i in self.instances]
        size = out[0].size if out else _cropped_size(box, self.size)
        return PolygonMasks(out, size)

    def resize(self, size):
        return PolygonMasks([i.resize(size) for i in self.instances],
                            tuple(size))

    def to_bitmasks(self) -> np.ndarray:
        w, h = self.size
        if not self.instances:
            return np.zeros((0, int(h), int(w)), np.uint8)
        return np.stack([i.to_bitmask() for i in self.instances])

    def __len__(self):
        return len(self.instances)

    def __getitem__(self, index):
        if isinstance(index, (int, np.integer)):
            sel = [self.instances[int(index)]]
        elif isinstance(index, slice):
            sel = self.instances[index]
        else:
            idx = np.asarray(index)
            if idx.dtype == bool:
                idx = np.nonzero(idx)[0]
            sel = [self.instances[int(i)] for i in idx]
        return PolygonMasks(sel, self.size)

    def __iter__(self):
        return iter(self.instances)


def _cropped_size(box, size):
    xmin, ymin, xmax, ymax = _clip_crop_box(box, size[0], size[1])
    return (xmax - xmin, ymax - ymin)


class Masks:
    """SegmentationMask facade (ref segmentation_mask.py:476-573): holds
    either polygon ('poly') or raster ('mask') instances with a shared
    transpose/crop/resize/getitem surface."""

    def __init__(self, instances, size, mode: str = "poly"):
        if mode == "poly":
            self.inner = (instances if isinstance(instances, PolygonMasks)
                          else PolygonMasks(instances, size))
        elif mode == "mask":
            self.inner = (instances if isinstance(instances, BinaryMasks)
                          else BinaryMasks(instances, size))
        else:
            raise ValueError(f"unknown mask mode {mode!r}")
        self.mode = mode
        self.size = tuple(size)

    def _wrap(self, inner):
        m = Masks.__new__(Masks)
        m.inner, m.mode, m.size = inner, self.mode, inner.size
        return m

    def transpose(self, method):
        return self._wrap(self.inner.transpose(method))

    def crop(self, box):
        return self._wrap(self.inner.crop(box))

    def resize(self, size):
        return self._wrap(self.inner.resize(size))

    def to_bitmasks(self) -> np.ndarray:
        return self.inner.to_bitmasks()

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, index):
        return self._wrap(self.inner[index])

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
