#!/usr/bin/env python
"""Generate a tiny synthetic COCO-layout dataset with instance masks,
keypoints, and a proposal pickle.

Drives the supervised (WSOD_ON=False) Mask/Keypoint R-CNN smoke configs
(configs/coco/coco_mask_rcnn_smoke.yaml) and their tests. Objects are
axis-aligned colored rectangles, so polygon masks are exact; a fraction
of instances carry COCO RLE segmentation dicts instead of polygons to
exercise the pure-python RLE codec (structures/rle.py). Keypoints are a
3x3 grid inside each box padded to 17 (COCO person layout).

Layout under <out>: coco/train2017/*.jpg, coco/val2017/*.jpg,
coco/annotations/instances_{train,val}2017.json,
proposal/SS-coco17_{train,val}.pkl (catalog names coco_2017_train/val).
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CATS = ["person", "bicycle", "car", "motorcycle", "airplane", "bus"]


def make_split(root, split, img_ids, rng, n_props=64, img_hw=(120, 144),
               rle_fraction=0.25):
    from odwscl_tpu.structures.rle import rle_encode

    img_dir = os.path.join(root, "coco", f"{split}2017")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    boxes_list, ids_list = [], []
    ann_id = 1
    for img_id in img_ids:
        h, w = img_hw
        img = rng.uniform(0, 80, (h, w, 3)).astype(np.uint8)
        n_obj = rng.randint(1, 4)
        for _ in range(n_obj):
            ow, oh = rng.randint(24, 56), rng.randint(24, 56)
            x1 = rng.randint(0, w - ow)
            y1 = rng.randint(0, h - oh)
            ci = rng.randint(len(CATS))
            color = np.array([(ci * 37) % 255, (ci * 91) % 255,
                              (ci * 151) % 255], np.uint8)
            img[y1:y1 + oh, x1:x1 + ow] = color
            # rectangle polygon (exact under the PIL rasterizer); some
            # instances ship as compressed RLE instead
            if rng.rand() < rle_fraction:
                m = np.zeros((h, w), np.uint8)
                m[y1:y1 + oh, x1:x1 + ow] = 1
                seg = rle_encode(m)
            else:
                seg = [[x1, y1, x1 + ow - 1, y1, x1 + ow - 1, y1 + oh - 1,
                        x1, y1 + oh - 1]]
            # 3x3 grid keypoints inside the box, padded to 17 invisible
            gx = np.linspace(x1 + 2, x1 + ow - 3, 3)
            gy = np.linspace(y1 + 2, y1 + oh - 3, 3)
            kps = []
            for yy in gy:
                for xx in gx:
                    kps += [float(xx), float(yy), 2]
            kps += [0.0, 0.0, 0] * (17 - 9)
            annotations.append({
                "id": ann_id, "image_id": int(img_id),
                "category_id": ci + 1,
                "bbox": [float(x1), float(y1), float(ow), float(oh)],
                "area": float(ow * oh), "iscrowd": 0,
                "segmentation": seg, "keypoints": kps,
                "num_keypoints": 9})
            ann_id += 1
        Image.fromarray(img).save(os.path.join(img_dir, f"{img_id:012d}.jpg"))
        images.append({"id": int(img_id), "file_name": f"{img_id:012d}.jpg",
                       "height": h, "width": w})
        # proposals: jittered GT + random boxes
        props = []
        for a in annotations:
            if a["image_id"] != img_id:
                continue
            x, y, bw, bh = a["bbox"]
            for _ in range(6):
                j = rng.randint(-6, 7, 4)
                props.append([max(x + j[0], 0), max(y + j[1], 0),
                              min(x + bw + j[2], w - 1),
                              min(y + bh + j[3], h - 1)])
        while len(props) < n_props:
            pw, ph = rng.randint(18, 60), rng.randint(18, 60)
            px = rng.randint(0, max(w - pw, 1))
            py = rng.randint(0, max(h - ph, 1))
            props.append([px, py, px + pw, py + ph])
        boxes_list.append(np.asarray(props, np.float32))
        ids_list.append(int(img_id))

    ann_dir = os.path.join(root, "coco", "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": i + 1, "name": n}
                           for i, n in enumerate(CATS)]}
    with open(os.path.join(ann_dir, f"instances_{split}2017.json"), "w") as f:
        json.dump(data, f)
    return boxes_list, ids_list


def main(out="/tmp/synth_coco", n_train=8, n_val=4, seed=0,
         img_hw=(120, 144), n_props=64):
    from odwscl_tpu.data.proposals import write_proposal_pickle

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out, "proposal"), exist_ok=True)
    b, i = make_split(out, "train", range(1, n_train + 1), rng, n_props,
                      img_hw)
    write_proposal_pickle(
        os.path.join(out, "proposal", "SS-coco17_train.pkl"), b, i)
    b, i = make_split(out, "val", range(n_train + 1, n_train + n_val + 1),
                      rng, n_props, img_hw)
    write_proposal_pickle(
        os.path.join(out, "proposal", "SS-coco17_val.pkl"), b, i)
    print(f"synthetic COCO at {out}: {n_train} train, {n_val} val")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_coco")
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    main(a.out, a.n_train, a.n_val, a.seed)
