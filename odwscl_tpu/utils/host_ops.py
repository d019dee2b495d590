"""ctypes bindings for the native host library (csrc/host_ops.cpp).

Builds lazily with make on first use; falls back to numpy implementations
if the toolchain or build is unavailable, so the framework works without
the native lib (just slower dataloading).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger("odwscl_tpu.host_ops")

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "csrc")
_LIB_PATH = os.path.join(_CSRC_DIR, "libhost_ops.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # pragma: no cover - toolchain-dependent
            logger.info("native host_ops unavailable (%s); using numpy", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.host_nms.restype = ctypes.c_int32
        lib.host_nms.argtypes = [f32p, f32p, ctypes.c_int32, ctypes.c_float, i32p]
        lib.host_iou_plus1.restype = None
        lib.host_iou_plus1.argtypes = [f32p, ctypes.c_int32, f32p,
                                       ctypes.c_int32, f32p]
        lib.host_clean_proposals.restype = ctypes.c_int32
        lib.host_clean_proposals.argtypes = [f64p, ctypes.c_int32,
                                             ctypes.c_float, ctypes.c_float,
                                             ctypes.c_float, f32p]
        _lib = lib
        logger.info("loaded native host_ops from %s", _LIB_PATH)
    except OSError as e:  # pragma: no cover
        logger.info("native host_ops failed to load (%s); using numpy", e)
    return _lib


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float):
    """Greedy NMS; returns kept indices in descending-score order."""
    lib = _load()
    if lib is None or len(boxes) == 0:
        from ..ops.nms import nms_numpy
        return nms_numpy(boxes, scores, iou_thresh)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(boxes), np.int32)
    n = lib.host_nms(boxes, scores, len(boxes), float(iou_thresh), keep)
    return keep[:n].tolist()


def iou_plus1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None or len(a) == 0 or len(b) == 0:
        from ..evaluation.voc_eval import _iou_plus1
        return _iou_plus1(np.asarray(a, np.float64), np.asarray(b, np.float64))
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.host_iou_plus1(a, len(a), b, len(b), out)
    return out


def clean_proposals(boxes: np.ndarray, img_w: float, img_h: float,
                    min_size: float) -> np.ndarray:
    """Dedup + clip + min-size in one native pass (coco.py:52, voc.py:87-111)."""
    lib = _load()
    if lib is None or len(boxes) == 0:
        return _clean_numpy(boxes, img_w, img_h, min_size)
    boxes = np.ascontiguousarray(boxes, np.float64)
    out = np.empty((len(boxes), 4), np.float32)
    n = lib.host_clean_proposals(boxes, len(boxes), float(img_w),
                                 float(img_h), float(min_size), out)
    return out[:n].copy()


def _clean_numpy(boxes, img_w, img_h, min_size):
    from ..data.proposals import unique_boxes
    boxes = np.asarray(boxes, np.float64)
    keep = unique_boxes(boxes)
    rois = boxes[keep].astype(np.float32)
    rois[:, 0::2] = rois[:, 0::2].clip(0, img_w - 1)
    rois[:, 1::2] = rois[:, 1::2].clip(0, img_h - 1)
    nonempty = (rois[:, 2] > rois[:, 0]) & (rois[:, 3] > rois[:, 1])
    rois = rois[nonempty]
    if min_size > 0:
        ws = rois[:, 2] - rois[:, 0] + 1
        hs = rois[:, 3] - rois[:, 1] + 1
        rois = rois[(ws >= min_size) & (hs >= min_size)]
    return rois
