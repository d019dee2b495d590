"""RetinaNet: dense anchor head over the FPN P3-P7 pyramid.

Parity target: wetectron/modeling/rpn/retinanet/ (~600 LoC — retinanet.py
RetinaNetHead/RetinaNetModule, loss.py RetinaNetLossComputation,
inference.py RetinaNetPostProcessor) + the Detectron-v1 anchor math in
modeling/rpn/anchor_generator.py:225-295. **Unused by every shipped WSOD
config** (SURVEY §2.1: "inherited, unused") — ported for framework
completeness. Note the reference's in-tree AnchorGenerator.grid_anchors
was hijacked by the CAM-attention hack (anchor_generator.py:74-95 emits
top-k attention coordinates; the classic dense grid survives only in the
commented-out lines) — this port implements the CLASSIC dense-grid
semantics RetinaNet needs, which our models/cam_proposals.py already
reproduces separately for the hacked path.

TPU-first: anchors are static per (level shape) and computed as jnp
grids; matching/labels are batched-masked (vmap over images) with the
Matcher sentinels; the focal loss is the pure-jnp kernel in ops/losses.py
(replacing csrc/cuda/SigmoidFocalLoss_cuda.cu); inference decodes all
levels into one padded [P, 4+score] tensor and reuses the masked
per-class NMS (engine/postprocess.py) — no per-level python loops over
dynamic shapes inside jit.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .matcher import match_proposals, BELOW_LOW_QUALITY, BETWEEN_THRESHOLDS
from ..ops.losses import sigmoid_focal_loss
from ..structures.boxes import encode_boxes, decode_boxes, masked_iou

_NORMAL01 = nn.initializers.normal(0.01)

REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)   # retinanet.py:103 BoxCoder weights


# ---------------------------------------------------------------------------
# anchors (Detectron v1 rounding math, anchor_generator.py:225-295)
# ---------------------------------------------------------------------------

def cell_anchors(stride: int, size: float, aspect_ratios: Sequence[float],
                 octave: float = 2.0,
                 scales_per_octave: int = 3) -> np.ndarray:
    """Per-cell anchors [A, 4] for one pyramid level: ratio enumeration
    with Detectron's ROUNDED widths/heights around the (0,0,stride-1,
    stride-1) window, then octave scales
    (make_anchor_generator_retinanet + _generate_anchors)."""
    scales = np.array([size * octave ** (i / scales_per_octave)
                       for i in range(scales_per_octave)]) / stride
    anchor = np.array([0.0, 0.0, stride - 1.0, stride - 1.0])

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mk(ws, hs, xc, yc):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                          xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)])

    w, h, xc, yc = whctrs(anchor)
    size_ratios = (w * h) / np.asarray(aspect_ratios, float)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(aspect_ratios, float))
    ratio_anchors = mk(ws, hs, xc, yc)
    out = []
    for ra in ratio_anchors:
        w, h, xc, yc = whctrs(ra)
        out.append(mk(w * scales, h * scales, xc, yc))
    return np.vstack(out).astype(np.float32)   # [A*spo... ordered ratio-major]


def grid_anchors(cell: np.ndarray, stride: int, gh: int,
                 gw: int) -> jnp.ndarray:
    """Dense shifts (the classic grid the CAM hack replaced): [gh*gw*A, 4]."""
    sx = jnp.arange(gw, dtype=jnp.float32) * stride
    sy = jnp.arange(gh, dtype=jnp.float32) * stride
    shift_x, shift_y = jnp.meshgrid(sx, sy, indexing="xy")
    shifts = jnp.stack([shift_x.reshape(-1), shift_y.reshape(-1),
                        shift_x.reshape(-1), shift_y.reshape(-1)], axis=1)
    return (shifts[:, None, :] + jnp.asarray(cell)[None, :, :]).reshape(-1, 4)


def pyramid_anchors(grid_sizes: Sequence[Tuple[int, int]],
                    strides: Sequence[int] = (8, 16, 32, 64, 128),
                    sizes: Sequence[float] = (32, 64, 128, 256, 512),
                    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
                    octave: float = 2.0,
                    scales_per_octave: int = 3) -> List[jnp.ndarray]:
    return [grid_anchors(cell_anchors(st, sz, aspect_ratios, octave,
                                      scales_per_octave), st, gh, gw)
            for (gh, gw), st, sz in zip(grid_sizes, strides, sizes)]


# ---------------------------------------------------------------------------
# head
# ---------------------------------------------------------------------------

class RetinaNetHead(nn.Module):
    """cls/box conv towers shared across pyramid levels
    (retinanet.py:13-85): NUM_CONVS 3x3+ReLU each, then 3x3 logits
    (A * (num_classes-1), bias = -log((1-p)/p) prior init) and 3x3 bbox
    (A * 4). Returns per-level ([N,H,W,A*(C-1)], [N,H,W,A*4]) lists."""

    num_classes: int                    # INCLUDING background (ref -1's it)
    num_anchors: int = 9
    num_convs: int = 4
    prior_prob: float = 0.01
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = features[0].shape[-1]
        cls_tower = [nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.compute_dtype,
                             param_dtype=jnp.float32, kernel_init=_NORMAL01,
                             name=f"cls_tower{i}")
                     for i in range(self.num_convs)]
        box_tower = [nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.compute_dtype,
                             param_dtype=jnp.float32, kernel_init=_NORMAL01,
                             name=f"bbox_tower{i}")
                     for i in range(self.num_convs)]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        cls_logits = nn.Conv(self.num_anchors * (self.num_classes - 1),
                             (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.compute_dtype,
                             param_dtype=jnp.float32, kernel_init=_NORMAL01,
                             bias_init=bias_init, name="cls_logits")
        bbox_pred = nn.Conv(self.num_anchors * 4, (3, 3),
                            padding=[(1, 1), (1, 1)],
                            dtype=self.compute_dtype,
                            param_dtype=jnp.float32, kernel_init=_NORMAL01,
                            name="bbox_pred")
        logits, bbox = [], []
        for f in features:
            x = f.astype(self.compute_dtype)
            y = x
            for conv in cls_tower:
                y = nn.relu(conv(y))
            logits.append(cls_logits(y).astype(jnp.float32))
            y = x
            for conv in box_tower:
                y = nn.relu(conv(y))
            bbox.append(bbox_pred(y).astype(jnp.float32))
        return logits, bbox


def flatten_head_outputs(logits: Sequence[jnp.ndarray],
                         bbox: Sequence[jnp.ndarray],
                         num_classes_fg: int):
    """[N,H,W,A*C'] per level -> ([N, sumHWA, C'], [N, sumHWA, 4]) in the
    same anchor order as pyramid_anchors (row-major grid, anchor-minor)."""
    ls, bs = [], []
    for lg, bb in zip(logits, bbox):
        n, h, w, _ = lg.shape
        ls.append(lg.reshape(n, h * w * (lg.shape[-1] // num_classes_fg),
                             num_classes_fg))
        bs.append(bb.reshape(n, h * w * (bb.shape[-1] // 4), 4))
    return jnp.concatenate(ls, axis=1), jnp.concatenate(bs, axis=1)


# ---------------------------------------------------------------------------
# loss (loss.py RetinaNetLossComputation)
# ---------------------------------------------------------------------------

def retinanet_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                      gt_labels: jnp.ndarray, gt_mask: jnp.ndarray,
                      fg_iou: float = 0.5, bg_iou: float = 0.4):
    """Per-image anchor targets. anchors [P,4]; gt [G,...]. Returns
    (labels [P] int32 with -1 = discard (between thresholds), reg_targets
    [P,4]). allow_low_quality_matches=True like the reference matcher."""
    amask = jnp.ones(anchors.shape[0], bool)
    iou = masked_iou(gt_boxes, gt_mask, anchors, amask)     # [G, P]
    matched = match_proposals(iou, gt_mask, fg_iou, bg_iou,
                              allow_low_quality_matches=True)
    labels = jnp.where(matched >= 0,
                       gt_labels[jnp.clip(matched, 0)], 0).astype(jnp.int32)
    labels = jnp.where(matched == BETWEEN_THRESHOLDS, -1, labels)
    reg = encode_boxes(gt_boxes[jnp.clip(matched, 0)], anchors, REG_WEIGHTS)
    return labels, reg


def retinanet_loss(logits: jnp.ndarray, bbox: jnp.ndarray,
                   labels: jnp.ndarray, reg_targets: jnp.ndarray,
                   beta: float = 0.11, reg_norm: float = 4.0,
                   gamma: float = 2.0, alpha: float = 0.25):
    """Batched focal + smooth-L1 (loss.py:43-81): cls summed over all
    non-discarded anchors / (npos + N_images); reg summed over positives
    / max(1, npos * reg_norm). logits [B,P,C-1], bbox [B,P,4],
    labels [B,P] (-1 discard), reg_targets [B,P,4]."""
    b = logits.shape[0]
    fl = sigmoid_focal_loss(logits.reshape(-1, logits.shape[-1]),
                            labels.reshape(-1), gamma, alpha)
    pos = (labels > 0).astype(jnp.float32)
    npos = pos.sum()
    cls_loss = fl.sum() / (npos + b)

    d = jnp.abs(bbox - reg_targets)
    sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    reg_loss = (sl1.sum(-1) * pos).sum() / jnp.maximum(npos * reg_norm, 1.0)
    return cls_loss, reg_loss


# ---------------------------------------------------------------------------
# inference (inference.py RetinaNetPostProcessor, batched-masked)
# ---------------------------------------------------------------------------

def retinanet_decode(anchors: jnp.ndarray, logits: jnp.ndarray,
                     bbox: jnp.ndarray, image_sizes: jnp.ndarray,
                     score_thresh: float = 0.05,
                     pre_nms_top_n: int = 1000):
    """Decode one batch: anchors [P,4], logits [B,P,C-1], bbox [B,P,4],
    image_sizes [B,2] (w,h). Returns (boxes [B,K,4], scores [B,K],
    labels [B,K], valid [B,K]) with K = pre_nms_top_n — the per-level
    thresh+topk of the reference collapsed into one masked global top-k
    per (image) over anchor*class pairs (equivalent selection when K
    bounds the union; static shapes for jit)."""
    b, p, cf = logits.shape
    probs = jax.nn.sigmoid(logits)                      # [B,P,C-1]
    flat = probs.reshape(b, p * cf)
    keep = flat > score_thresh
    k = min(pre_nms_top_n, p * cf)
    scores, idx = jax.lax.top_k(jnp.where(keep, flat, 0.0), k)
    anchor_i = idx // cf
    label = (idx % cf) + 1                              # contiguous fg ids
    sel_anchors = anchors[anchor_i]                     # [B,K,4]
    sel_reg = jnp.take_along_axis(bbox, anchor_i[..., None], axis=1)
    boxes = decode_boxes(sel_reg, sel_anchors, REG_WEIGHTS)
    w = image_sizes[:, 0][:, None]
    h = image_sizes[:, 1][:, None]
    boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w - 1),
                       jnp.clip(boxes[..., 1], 0, h - 1),
                       jnp.clip(boxes[..., 2], 0, w - 1),
                       jnp.clip(boxes[..., 3], 0, h - 1)], axis=-1)
    valid = scores > score_thresh
    return boxes, scores, label.astype(jnp.int32), valid


# ---------------------------------------------------------------------------
# full detector (RetinaNetModule, retinanet.py:88-144) — built from cfg by
# models.build_model when MODEL.RETINANET_ON=True (VERDICT r4 task 2)
# ---------------------------------------------------------------------------

class RetinaNetDetector(nn.Module):
    """P3-P7 FPN backbone + shared-tower head + batched loss/decode over a
    padded Batch. Train: (losses, metrics) like the other detectors
    (engine/trainer.py drives it unchanged); eval: decoded top-K
    detections dict (engine finalizes with the masked per-class NMS)."""

    num_classes: int = 81               # including background
    depth: str = "R-50"
    use_c5: bool = True
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_strides: Sequence[int] = (8, 16, 32, 64, 128)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    octave: float = 2.0
    scales_per_octave: int = 3
    num_convs: int = 4
    prior_prob: float = 0.01
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    loss_gamma: float = 2.0
    loss_alpha: float = 0.25
    reg_beta: float = 0.11
    reg_norm: float = 4.0               # BBOX_REG_WEIGHT
    score_thresh: float = 0.05          # INFERENCE_TH
    pre_nms_top_n: int = 1000
    compute_dtype: str = "bfloat16"

    def setup(self):
        from .fpn import ResNetFPNP3P7Backbone
        dtype = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                 else jnp.float32)
        self.backbone = ResNetFPNP3P7Backbone(depth=self.depth,
                                              use_c5=self.use_c5,
                                              compute_dtype=dtype)
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.aspect_ratios) * self.scales_per_octave,
            num_convs=self.num_convs, prior_prob=self.prior_prob,
            compute_dtype=dtype)

    def _forward_dense(self, batch):
        feats = self.backbone(batch.images)
        logits_l, bbox_l = self.head(feats)
        logits, bbox = flatten_head_outputs(logits_l, bbox_l,
                                            self.num_classes - 1)
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.concatenate(pyramid_anchors(
            grid_sizes, tuple(self.anchor_strides),
            tuple(self.anchor_sizes), tuple(self.aspect_ratios),
            self.octave, self.scales_per_octave))
        return anchors, logits, bbox

    def __call__(self, batch, train: bool = False, calibrate: bool = False):
        anchors, logits, bbox = self._forward_dense(batch)
        if not train:
            boxes, scores, labels, valid = retinanet_decode(
                anchors, logits, bbox,
                batch.image_sizes[:, ::-1],     # (h,w) -> (w,h)
                self.score_thresh, self.pre_nms_top_n)
            return {"boxes": boxes, "scores": scores, "labels": labels,
                    "valid": valid}
        if batch.gt_boxes is None:
            raise ValueError("RetinaNet training needs Batch gt_boxes "
                             "(collate include_gt)")
        labels, reg = jax.vmap(
            lambda gb, gl, gm: retinanet_targets(anchors, gb, gl, gm,
                                                 self.fg_iou, self.bg_iou)
        )(batch.gt_boxes, batch.gt_labels, batch.gt_mask)
        cls_loss, reg_loss = retinanet_loss(
            logits, bbox, labels, reg, self.reg_beta, self.reg_norm,
            self.loss_gamma, self.loss_alpha)
        losses = {"loss_retina_cls": cls_loss, "loss_retina_reg": reg_loss}
        metrics = {"n_pos_anchors": (labels > 0).sum().astype(jnp.float32)}
        return losses, metrics

    def init_all(self, batch):
        """Eval forward touches every submodule (engine/trainer.py
        create_train_state initializer protocol)."""
        return self(batch, train=False)


def retinanet_from_cfg(cfg) -> RetinaNetDetector:
    r = cfg.MODEL.RETINANET
    body = cfg.MODEL.BACKBONE.CONV_BODY
    # accept both the FPN-RETINANET registry names and bare R-50/R-101
    depth = "-".join(body.split("-")[:2]) if body.startswith("R-") else "R-50"
    return RetinaNetDetector(
        num_classes=r.NUM_CLASSES, depth=depth, use_c5=r.USE_C5,
        anchor_sizes=tuple(r.ANCHOR_SIZES),
        anchor_strides=tuple(r.ANCHOR_STRIDES),
        aspect_ratios=tuple(r.ASPECT_RATIOS), octave=r.OCTAVE,
        scales_per_octave=r.SCALES_PER_OCTAVE, num_convs=r.NUM_CONVS,
        prior_prob=r.PRIOR_PROB, fg_iou=r.FG_IOU_THRESHOLD,
        bg_iou=r.BG_IOU_THRESHOLD, loss_gamma=r.LOSS_GAMMA,
        loss_alpha=r.LOSS_ALPHA, reg_beta=r.BBOX_REG_BETA,
        reg_norm=r.BBOX_REG_WEIGHT, score_thresh=r.INFERENCE_TH,
        pre_nms_top_n=r.PRE_NMS_TOP_N,
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
    )
