#!/usr/bin/env python
"""Generate a tiny synthetic VOC-layout dataset + proposal pickle.

Used by integration tests and smoke verification (SURVEY.md section 4:
"20-iteration train on synthetic images + synthetic proposal pickle").
Creates JPEGImages/, Annotations/ (XML), ImageSets/Main/{trainval,test}.txt
under <out>/voc/VOC2007 and Selective-Search-style proposal pickles.
"""

import argparse
import os
import pickle
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VOC_CLASSES = ["aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
               "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor"]

XML_TMPL = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""
OBJ_TMPL = """<object>
    <name>{name}</name><difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_split(root, split, ids, rng, n_props=64, img_hw=(120, 144)):
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    boxes_list, ids_list = [], []
    for img_id in ids:
        h, w = img_hw
        img = (rng.uniform(0, 80, (h, w, 3))).astype(np.uint8)
        n_obj = rng.randint(1, 3)
        objects = []
        gt = []
        for _ in range(n_obj):
            ow, oh = rng.randint(30, 60), rng.randint(30, 60)
            x1 = rng.randint(0, w - ow)
            y1 = rng.randint(0, h - oh)
            cls_idx = rng.randint(len(VOC_CLASSES))
            color = np.array([(cls_idx * 37) % 255, (cls_idx * 91) % 255,
                              (cls_idx * 151) % 255], np.uint8)
            img[y1:y1 + oh, x1:x1 + ow] = color
            gt.append((x1, y1, x1 + ow - 1, y1 + oh - 1))
            objects.append(OBJ_TMPL.format(
                name=VOC_CLASSES[cls_idx], difficult=0,
                x1=x1 + 1, y1=y1 + 1, x2=x1 + ow, y2=y1 + oh))  # 1-based XML
        Image.fromarray(img).save(os.path.join(root, "JPEGImages",
                                               f"{img_id}.jpg"))
        with open(os.path.join(root, "Annotations", f"{img_id}.xml"), "w") as f:
            f.write(XML_TMPL.format(w=w, h=h, objects="\n  ".join(objects)))
        # proposals: jittered GT + random boxes (SS-like)
        props = []
        for (x1, y1, x2, y2) in gt:
            for _ in range(6):
                j = rng.randint(-8, 9, 4)
                props.append([max(x1 + j[0], 0), max(y1 + j[1], 0),
                              min(x2 + j[2], w - 1), min(y2 + j[3], h - 1)])
        while len(props) < n_props:
            pw, ph = rng.randint(22, 70), rng.randint(22, 70)
            px = rng.randint(0, max(w - pw, 1))
            py = rng.randint(0, max(h - ph, 1))
            props.append([px, py, px + pw, py + ph])
        boxes_list.append(np.asarray(props, np.float32))
        ids_list.append(int(img_id))
    with open(os.path.join(root, "ImageSets", "Main", f"{split}.txt"), "w") as f:
        f.write("\n".join(str(i) for i in ids) + "\n")
    return boxes_list, ids_list


def main(out="/tmp/synth_voc", n_train=8, n_test=4, seed=0,
         img_hw=(120, 144), n_props=64):
    from odwscl_tpu.data.proposals import write_proposal_pickle

    rng = np.random.RandomState(seed)
    root = os.path.join(out, "voc", "VOC2007")
    train_ids = [f"{i:06d}" for i in range(1, n_train + 1)]
    test_ids = [f"{i:06d}" for i in range(n_train + 1, n_train + n_test + 1)]
    os.makedirs(os.path.join(out, "proposal"), exist_ok=True)
    b, i = make_split(root, "trainval", train_ids, rng, n_props, img_hw)
    write_proposal_pickle(os.path.join(out, "proposal", "SS-voc07_trainval.pkl"), b, i)
    b, i = make_split(root, "test", test_ids, rng, n_props, img_hw)
    write_proposal_pickle(os.path.join(out, "proposal", "SS-voc07_test.pkl"), b, i)
    print(f"synthetic VOC at {out}: {n_train} train, {n_test} test "
          f"({img_hw[0]}x{img_hw[1]}, {n_props} proposals)")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_voc")
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-test", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    # realistic-VOC knobs for the e2e eval bench (tools/bench_eval_e2e.py)
    ap.add_argument("--img-h", type=int, default=120)
    ap.add_argument("--img-w", type=int, default=144)
    ap.add_argument("--n-props", type=int, default=64)
    a = ap.parse_args()
    main(a.out, a.n_train, a.n_test, a.seed, (a.img_h, a.img_w), a.n_props)
