"""Host-side (CPU) image/box transforms.

Reference: wetectron/data/transforms/transforms.py + build.py. These run in
the input pipeline before device transfer, exactly like the reference's
PIL-side pipeline: color jitter -> random-scale resize -> flips ->
to-tensor -> PCA lighting -> BGR*255 normalize (build.py:49-71). All
randomness is an explicit numpy Generator so workers are reproducible
(reference seeds workers at data/build.py:231).

Images are numpy HWC float32 throughout; boxes are numpy [N, 4] xyxy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
IMAGENET_PCA_EIGVEC = np.array([
    [-0.5675, 0.7192, 0.4009],
    [-0.5808, -0.0045, -0.8140],
    [-0.5836, -0.6948, 0.4203],
], np.float32)


@dataclasses.dataclass
class Sample:
    """One image with its (optional) GT boxes and proposals, all in the
    current image's coordinate frame."""

    image: Image.Image | np.ndarray
    size: Tuple[int, int]                 # (w, h) current
    gt_boxes: Optional[np.ndarray] = None
    gt_labels: Optional[np.ndarray] = None
    gt_difficult: Optional[np.ndarray] = None
    rois: Optional[np.ndarray] = None
    image_id: Optional[object] = None
    # partial-label supervision (reference coco.py:155-172: per-object
    # 'point' clicks / 'scribble' boxes, labels shared with gt_labels)
    clicks: Optional[np.ndarray] = None          # [K, 2] (x, y)
    click_labels: Optional[np.ndarray] = None    # [K]
    scribbles: Optional[np.ndarray] = None       # [S, 4] xyxy
    scribble_labels: Optional[np.ndarray] = None  # [S]
    # fully-supervised instance annotations (MODEL.WSOD_ON=False / MASK_ON
    # / KEYPOINT_ON; reference coco.py:95-115 parses them into the target
    # BoxList's "masks"/"keypoints" fields). gt_masks is a structures.masks
    # container (Masks/PolygonMasks/BinaryMasks — carries its own
    # resize/transpose); gt_keypoints a structures.keypoints.Keypoints.
    gt_masks: Optional[object] = None
    gt_keypoints: Optional[object] = None


def get_resize_size(size_wh: Tuple[int, int], min_size: int,
                    max_size: Optional[int]) -> Tuple[int, int]:
    """(oh, ow) shortest-side resize with max cap (transforms.py:41-61)."""
    w, h = size_wh
    size = min_size
    if max_size is not None:
        min_orig, max_orig = float(min(w, h)), float(max(w, h))
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if (w <= h and w == size) or (h <= w and h == size):
        return (h, w)
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return (oh, ow)


def resize(sample: Sample, min_size, max_size, rng: Optional[np.random.RandomState] = None) -> Sample:
    if isinstance(min_size, (list, tuple)):
        assert rng is not None
        min_size = min_size[rng.randint(len(min_size))]
    oh, ow = get_resize_size(sample.size, int(min_size), max_size)
    w, h = sample.size
    img = sample.image
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img.astype(np.uint8))
    img = img.resize((ow, oh), Image.BILINEAR)
    rw, rh = ow / w, oh / h

    def scale(b):
        if b is None or len(b) == 0:
            return b
        out = b.astype(np.float32).copy()
        out[:, 0::2] *= rw
        out[:, 1::2] *= rh
        return out

    return dataclasses.replace(
        sample, image=img, size=(ow, oh),
        gt_boxes=scale(sample.gt_boxes),
        rois=scale(sample.rois),
        clicks=scale(sample.clicks),
        scribbles=scale(sample.scribbles),
        gt_masks=(sample.gt_masks.resize((ow, oh))
                  if sample.gt_masks is not None else None),
        gt_keypoints=(sample.gt_keypoints.resize((ow, oh))
                      if sample.gt_keypoints is not None else None))


def hflip(sample: Sample) -> Sample:
    img = sample.image
    if isinstance(img, np.ndarray):
        img = img[:, ::-1]
    else:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    w = sample.size[0]

    def flip(b):
        if b is None or len(b) == 0:
            return b
        out = b.copy()
        out[:, 0] = w - b[:, 2] - 1  # TO_REMOVE convention (bounding_box.py)
        out[:, 2] = w - b[:, 0] - 1
        return out

    def flip_pts(p):  # Click.transpose (keypoint.py:200-209)
        if p is None or len(p) == 0:
            return p
        out = p.copy()
        out[:, 0] = w - p[:, 0] - 1
        return out

    from ..structures.masks import FLIP_LEFT_RIGHT
    return dataclasses.replace(
        sample, image=img, gt_boxes=flip(sample.gt_boxes),
        rois=flip(sample.rois),
        clicks=flip_pts(sample.clicks),
        scribbles=flip(sample.scribbles),
        gt_masks=(sample.gt_masks.transpose(FLIP_LEFT_RIGHT)
                  if sample.gt_masks is not None else None),
        gt_keypoints=(sample.gt_keypoints.transpose(FLIP_LEFT_RIGHT)
                      if sample.gt_keypoints is not None else None))


def vflip(sample: Sample) -> Sample:
    """Vertical flip (reference transforms.py:87-99, BoxList.transpose(1))."""
    if sample.gt_keypoints is not None:
        # Keypoints.transpose only defines FLIP_LEFT_RIGHT (like the
        # reference keypoint.py:45); fail loudly instead of mis-flipping
        raise NotImplementedError("vflip with gt_keypoints is undefined")
    img = sample.image
    if isinstance(img, np.ndarray):
        img = img[::-1]
    else:
        img = img.transpose(Image.FLIP_TOP_BOTTOM)
    h = sample.size[1]

    def flip(b):
        if b is None or len(b) == 0:
            return b
        out = b.copy()
        out[:, 1] = h - b[:, 3] - 1
        out[:, 3] = h - b[:, 1] - 1
        return out

    def flip_pts(p):
        if p is None or len(p) == 0:
            return p
        out = p.copy()
        out[:, 1] = h - p[:, 1] - 1
        return out

    from ..structures.masks import FLIP_TOP_BOTTOM
    return dataclasses.replace(
        sample, image=img, gt_boxes=flip(sample.gt_boxes),
        rois=flip(sample.rois),
        clicks=flip_pts(sample.clicks),
        scribbles=flip(sample.scribbles),
        gt_masks=(sample.gt_masks.transpose(FLIP_TOP_BOTTOM)
                  if sample.gt_masks is not None else None))


def color_jitter(sample: Sample, rng: np.random.RandomState,
                 brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0) -> Sample:
    """torchvision-equivalent ColorJitter on PIL images; all-zero params are
    the shipped default (defaults.py:73-76) making this a no-op."""
    img = sample.image
    if brightness == contrast == saturation == hue == 0.0:
        return sample
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img.astype(np.uint8))
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f))
    if saturation > 0:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f))
    if hue > 0:
        shift = rng.uniform(-hue, hue)

        def _hue(im, shift=shift):
            hsv = np.array(im.convert("HSV"), np.uint8)
            hsv[..., 0] = (hsv[..., 0].astype(np.int16)
                           + int(shift * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")

        ops.append(_hue)
    order = rng.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return dataclasses.replace(sample, image=img)


def to_array(sample: Sample) -> Sample:
    """PIL -> float32 HWC RGB in [0, 1] (F.to_tensor semantics)."""
    img = sample.image
    if not isinstance(img, np.ndarray):
        img = np.asarray(img, np.float32) / 255.0
    elif img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return dataclasses.replace(sample, image=img.astype(np.float32))


def pca_lighting(sample: Sample, rng: np.random.RandomState,
                 alphastd: float = 0.1) -> Sample:
    """AlexNet-style PCA lighting noise (transforms.py:134-150), applied to
    the RGB [0,1] array."""
    if alphastd == 0:
        return sample
    alpha = rng.normal(0, alphastd, 3).astype(np.float32)
    rgb = (IMAGENET_PCA_EIGVEC * alpha[None, :] * IMAGENET_PCA_EIGVAL[None, :]
           ).sum(axis=1)
    return dataclasses.replace(sample, image=sample.image + rgb[None, None, :])


def normalize(sample: Sample, mean: Sequence[float], std: Sequence[float],
              to_bgr255: bool = True) -> Sample:
    img = sample.image
    if to_bgr255:
        img = img[..., ::-1] * 255.0
    img = (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return dataclasses.replace(sample, image=np.ascontiguousarray(img, np.float32))


@dataclasses.dataclass
class TrainTransform:
    """Full train pipeline (build.py:49-60, ``INPUT.PCA`` on by default)."""

    min_sizes: Sequence[int]
    max_size: int
    hflip_prob: float = 0.5
    vflip_prob: float = 0.0
    pixel_mean: Sequence[float] = (102.9801, 115.9465, 122.7717)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    to_bgr255: bool = True
    pca: bool = True
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0

    def __call__(self, sample: Sample, rng: np.random.RandomState) -> Sample:
        sample = color_jitter(sample, rng, self.brightness, self.contrast,
                              self.saturation, self.hue)
        sample = resize(sample, tuple(self.min_sizes), self.max_size, rng)
        if rng.random_sample() < self.hflip_prob:
            sample = hflip(sample)
        if self.vflip_prob and rng.random_sample() < self.vflip_prob:
            sample = vflip(sample)
        sample = to_array(sample)
        if self.pca:
            sample = pca_lighting(sample, rng, 0.1)
        return normalize(sample, self.pixel_mean, self.pixel_std, self.to_bgr255)


@dataclasses.dataclass
class EvalTransform:
    min_size: int
    max_size: int
    pixel_mean: Sequence[float] = (102.9801, 115.9465, 122.7717)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    to_bgr255: bool = True
    flip: bool = False

    def __call__(self, sample: Sample) -> Sample:
        sample = resize(sample, self.min_size, self.max_size)
        if self.flip:
            sample = hflip(sample)
        sample = to_array(sample)
        return normalize(sample, self.pixel_mean, self.pixel_std, self.to_bgr255)


def build_train_transform(cfg) -> TrainTransform:
    return TrainTransform(
        min_sizes=tuple(cfg.INPUT.MIN_SIZE_TRAIN) if isinstance(
            cfg.INPUT.MIN_SIZE_TRAIN, (tuple, list)) else (cfg.INPUT.MIN_SIZE_TRAIN,),
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        hflip_prob=cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN,
        vflip_prob=cfg.INPUT.VERTICAL_FLIP_PROB_TRAIN,
        pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
        pixel_std=tuple(cfg.INPUT.PIXEL_STD),
        to_bgr255=cfg.INPUT.TO_BGR255,
        pca=cfg.INPUT.PCA,
        brightness=cfg.INPUT.BRIGHTNESS,
        contrast=cfg.INPUT.CONTRAST,
        saturation=cfg.INPUT.SATURATION,
        hue=cfg.INPUT.HUE,
    )
