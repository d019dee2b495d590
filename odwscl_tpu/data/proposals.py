"""Precomputed proposal handling (Selective Search / MCG pickles).

Reference: the pickle format {'boxes': [N_i x 4 arrays], 'indexes'|'ids':
[image ids]} consumed at wetectron/data/datasets/voc.py:61-124 and
coco.py:120-150, plus the offline MATLAB converters
(utils/proposal_convert.py). Per image: dedup via coordinate hashing
(coco.py:52 `unique_boxes`), clip to image, drop boxes smaller than
min_size (20 for VOC, 2 for COCO).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np


def unique_boxes(boxes: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Indices of unique boxes (reference coco.py:52-57), original order."""
    v = np.array([1, 1e3, 1e6, 1e9])
    hashes = np.round(boxes * scale).dot(v)
    _, index = np.unique(hashes, return_index=True)
    return np.sort(index)


class ProposalStore:
    """Loads a proposal pickle once and serves per-image cleaned proposals."""

    def __init__(self, proposal_file: str, min_size: float = 20.0):
        with open(proposal_file, "rb") as f:
            self.data = pickle.load(f, encoding="latin1")
        id_field = "indexes" if "indexes" in self.data else "ids"
        self.index_of = {int(i): k for k, i in enumerate(self.data[id_field])}
        self.min_size = min_size

    def get(self, image_id: int, image_size_wh) -> np.ndarray:
        """Cleaned xyxy proposals for one image (voc.py:87-111): dedup via
        coordinate hashing, clip to image, drop small boxes — one native
        C++ pass (csrc/host_ops.cpp) with a numpy fallback."""
        from ..utils.host_ops import clean_proposals

        idx = self.index_of[int(image_id)]
        rois = np.asarray(self.data["boxes"][idx], np.float64)
        w, h = image_size_wh
        return clean_proposals(rois, w, h, self.min_size)


def convert_ss_boxes(mat_boxes: np.ndarray) -> np.ndarray:
    """MATLAB Selective Search boxes are 1-indexed (y1,x1,y2,x2); convert to
    0-indexed xyxy (reference utils/proposal_convert.py:40-41)."""
    b = np.asarray(mat_boxes, np.float64)
    return b[:, (1, 0, 3, 2)] - 1


def write_proposal_pickle(path: str, boxes_list, ids_list, scores_list=None):
    """Write the reference pickle format for interop with its tools."""
    data: Dict[str, object] = {
        "boxes": [np.asarray(b) for b in boxes_list],
        "indexes": [int(i) for i in ids_list],
    }
    if scores_list is not None:
        data["scores"] = [np.asarray(s) for s in scores_list]
    with open(path, "wb") as f:
        pickle.dump(data, f)
