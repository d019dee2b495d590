#!/usr/bin/env python
"""Convert MATLAB Selective Search / MCG proposals to the pickle format.

Reference: wetectron/utils/proposal_convert.py — SS proposals come as one
.mat with a ragged 'boxes' cell array; MCG as one .mat per image. Both are
1-indexed (y1, x1, y2, x2); output is the 0-indexed xyxy pickle
{'boxes': [N_i x 4], 'scores': [...], 'indexes': [image ids]}.

Usage:
  python tools/proposal_convert.py ss  <dataset_name> <file_in.mat> <file_out.pkl>
  python tools/proposal_convert.py mcg <dataset_name> <dir_in>      <file_out.pkl>
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odwscl_tpu.data.build import build_dataset
from odwscl_tpu.data.proposals import convert_ss_boxes, write_proposal_pickle


def image_index(dataset, dataset_name: str, i: int):
    """Per-dataset image id convention (proposal_convert.py:95-106)."""
    info = dataset.get_img_info(i)
    stem = os.path.basename(info["file_name"])[:-4]
    if "coco" in dataset_name or "flickr" in dataset_name:
        return dataset.get_origin_id(i)
    if "2012" in dataset_name:
        return int("".join(stem.split("_")))
    return int(stem)


def convert_ss(dataset_name, file_in, file_out, data_root):
    import scipy.io as sio

    dataset = build_dataset(dataset_name, None, False, data_root)
    raw = sio.loadmat(file_in)["boxes"].ravel()
    assert raw.shape[0] == len(dataset), (raw.shape, len(dataset))
    boxes, scores, ids = [], [], []
    for i in range(len(dataset)):
        b = convert_ss_boxes(raw[i])
        boxes.append(b.astype(np.int16))
        scores.append(np.ones(len(b), np.float32))
        ids.append(image_index(dataset, dataset_name, i))
    write_proposal_pickle(file_out, boxes, ids, scores)
    print(f"wrote {len(ids)} images -> {file_out}")


def convert_mcg(dataset_name, dir_in, file_out, data_root):
    import scipy.io as sio

    dataset = build_dataset(dataset_name, None, False, data_root)
    boxes, scores, ids = [], [], []
    for i in range(len(dataset)):
        stem = os.path.basename(dataset.get_img_info(i)["file_name"])[:-4]
        mat = sio.loadmat(os.path.join(dir_in, f"{stem}.mat"))
        key_b = "bboxes" if "flickr" in dataset_name else "boxes"
        key_s = "bboxes_scores" if "flickr" in dataset_name else "scores"
        b = np.asarray(mat[key_b], np.float64)[:, (1, 0, 3, 2)] - 1
        boxes.append(b.astype(np.int16))
        scores.append(np.squeeze(np.asarray(mat[key_s], np.float32)))
        ids.append(image_index(dataset, dataset_name, i))
        if i % 1000 == 0:
            print(f"{i + 1}/{len(dataset)}")
    write_proposal_pickle(file_out, boxes, ids, scores)
    print(f"wrote {len(ids)} images -> {file_out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["ss", "mcg"])
    ap.add_argument("dataset_name")
    ap.add_argument("path_in")
    ap.add_argument("file_out")
    ap.add_argument("--data-root", default="datasets")
    a = ap.parse_args()
    if a.kind == "ss":
        convert_ss(a.dataset_name, a.path_in, a.file_out, a.data_root)
    else:
        convert_mcg(a.dataset_name, a.path_in, a.file_out, a.data_root)
