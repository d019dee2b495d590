"""Numpy transcription of the reference's contrastive mining + od_layer math
(wetectron weak_head/loss.py:270-347, pseudo_label_generator.py:135-197,
sim_head/sim_loss.py:44-80), used as the golden oracle for the batched jnp
implementation. Test-only code — literal per-image/per-class loops.

One deliberate deviation, mirrored in the framework: the reference's
SupConLossV2 weight vector (`instance_diff`) is appended in (image, class)
order while features are concatenated class-major, silently permuting the
weights relative to entries. Here each entry carries its own hardness
(aligned semantics); the framework does the same.
"""

import numpy as np

from odwscl_tpu.ops.nms import nms_numpy


def iou_plus1(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def encode(ref_boxes, proposals, weights=(10.0, 10.0, 5.0, 5.0)):
    ew = proposals[:, 2] - proposals[:, 0] + 1
    eh = proposals[:, 3] - proposals[:, 1] + 1
    ex = proposals[:, 0] + 0.5 * ew
    ey = proposals[:, 1] + 0.5 * eh
    gw = ref_boxes[:, 2] - ref_boxes[:, 0] + 1
    gh = ref_boxes[:, 3] - ref_boxes[:, 1] + 1
    gx = ref_boxes[:, 0] + 0.5 * gw
    gy = ref_boxes[:, 1] + 0.5 * gh
    wx, wy, ww, wh = weights
    return np.stack([wx * (gx - ex) / ew, wy * (gy - ey) / eh,
                     ww * np.log(gw / ew), wh * np.log(gh / eh)], axis=1)


def ref_mining(boxes, final, refs, z, z_drop, z_noise, labels_fg,
               p_thres=0.5, nms_iou=0.1):
    """Full stage A + stage B (loss.py:270-345).

    boxes: list of [P,4]; final: list of [P,C]; refs: [R] list of list [P,C]
    (softmaxed); z/z_drop/z_noise: list of [P,D]; labels_fg: list of sets of
    fg class indices (0-based, i.e. reference's pos_c).

    Returns dict with per-class banks [(emb, hardness)], pgt_index sets,
    pgt_instance (ordered arrays), per-entry aligned features/labels/weights.
    """
    num_imgs = len(boxes)
    num_refs = len(refs)
    c1 = final[0].shape[1] - 1

    pgt_index = [[set() for _ in range(c1)] for _ in range(num_imgs)]
    bank_feats = [[] for _ in range(c1)]   # list of (emb [K,D], hard [K])
    ious = [iou_plus1(b, b) for b in boxes]

    def hardness(b, samples, c):
        return final[b][samples, c + 1] / final[b][:, c + 1].sum()

    # ---- stage A (loss.py:281-307)
    for b in range(num_imgs):
        for i in range(num_refs):
            src = final[b] if i == 0 else refs[i - 1][b]
            prop = src[:, 1:]
            for c in sorted(labels_fg[b]):
                mi = int(np.argmax(prop[:, c]))
                idxs = np.nonzero(ious[b][:, mi] >= p_thres)[0]
                pgt_index[b][c] |= set(idxs.tolist())
        for c in sorted(labels_fg[b]):
            samples = np.array(sorted(pgt_index[b][c]), int)
            h = hardness(b, samples, c)
            bank_feats[c].append((z[b][samples], h))
            bank_feats[c].append((z_drop[b][samples], h))
            bank_feats[c].append((z_noise[b][samples], h))

    # pgt_collection snapshot: all stage-A entries (loss.py:307)
    collection = [np.concatenate([e for e, _ in bank_feats[c]])
                  if bank_feats[c] else np.zeros((0, z[0].shape[1]))
                  for c in range(c1)]

    # ---- stage B (loss.py:309-345)
    pgt_instance = [[{} for _ in range(num_refs)] for _ in range(num_imgs)]
    for b in range(num_imgs):
        simmat = z[b] @ z[b].T
        for i in range(num_refs):
            src = final[b] if i == 0 else refs[i - 1][b]
            prop = src[:, 1:]
            for c in sorted(labels_fg[b]):
                mi = int(np.argmax(prop[:, c]))
                thresh = (z[b][mi] @ collection[c].T).mean()
                cur = simmat[mi] >= thresh
                for c2 in sorted(labels_fg[b]):
                    if c2 == c:
                        continue
                    mi2 = int(np.argmax(prop[:, c2]))
                    cur = cur.astype(np.float64) >= simmat[mi2]
                cluster = np.nonzero(cur)[0]
                if len(cluster):
                    keep = nms_numpy(boxes[b][cluster], prop[cluster, c], nms_iou)
                    sim_close = cluster[keep]
                else:
                    sim_close = np.array([], int)
                if len(sim_close) == 0:
                    sim_close = np.array([mi], int)
                pgt_instance[b][i][c] = sim_close.copy()

                new = np.array([s for s in sim_close
                                if s not in pgt_index[b][c]], int)
                if len(new) == 0:
                    new = np.array([mi], int)
                bank_feats[c].append((z[b][new], hardness(b, new, c)))
                pgt_index[b][c] |= set(new.tolist())

    feats, labels, hard = [], [], []
    for c in range(c1):
        for e, h in bank_feats[c]:
            feats.append(e)
            labels.append(np.full(len(e), c))
            hard.append(h)
    return {
        "features": np.concatenate(feats) if feats else np.zeros((0, 1)),
        "labels": np.concatenate(labels) if labels else np.zeros((0,)),
        "hardness": np.concatenate(hard) if hard else np.zeros((0,)),
        "pgt_index": pgt_index,
        "pgt_instance": pgt_instance,
    }


def ref_supcon_v2(features, labels, score_col, temperature=0.2):
    """sim_loss.py:44-80 with aligned weights."""
    sim = features @ features.T / temperature
    sim = sim - sim.max(axis=1, keepdims=True)
    logits_mask = 1.0 - np.eye(len(features))
    exp_sim = np.exp(sim)
    label_mask = (labels[:, None] == labels[None, :]).astype(np.float64)
    mask = logits_mask * label_mask
    log_prob = np.log((exp_sim * mask).sum(1) / (exp_sim * logits_mask).sum(1))
    return float((-log_prob * score_col).mean())


def ref_od_layer(boxes, src, labels_fg, pgt_instance_c, fg_iou=0.5):
    """pseudo_label_generator.py:135-197 for one image/branch.

    src: [P, C] source scores; pgt_instance_c: dict class -> ordered indices.
    """
    p = len(boxes)
    prob = src[:, 1:].copy()
    gt_boxes, gt_cls, gt_scores = [], [], []
    for c in sorted(labels_fg):
        mi = int(np.argmax(prob[:, c]))
        sim_box = pgt_instance_c.get(c, np.array([], int))
        if len(sim_box) == 0:
            gt_boxes.append(boxes[mi][None])
            gt_cls.append(np.array([c + 1]))
            gt_scores.append(prob[mi, c][None])
        else:
            gt_boxes.append(boxes[sim_box])
            gt_cls.append(np.full(len(sim_box), c + 1))
            gt_scores.append(prob[sim_box, c])
        prob[mi, :] = 0.0
    if not gt_boxes:
        return (np.zeros(p, int), np.zeros(p), np.zeros((p, 4)))
    gt_boxes = np.concatenate(gt_boxes)
    gt_cls = np.concatenate(gt_cls)
    gt_scores = np.concatenate(gt_scores)

    ov = iou_plus1(boxes, gt_boxes)
    max_ov = ov.max(axis=1)
    assign = ov.argmax(axis=1)  # numpy first-max (reference :176-177)
    lab = gt_cls[assign].copy()
    lab[max_ov <= fg_iou] = 0
    wgt = gt_scores[assign]
    reg = encode(gt_boxes[assign], boxes)
    return lab, wgt, reg
