"""CombinedROIHeads: the fully-supervised box + mask + keypoint dispatch.

Parity target: wetectron/modeling/roi_heads/roi_heads.py:10-85
(CombinedROIHeads / build_roi_heads) — the WSOD_ON=False branch every
shipped config skips (roi_heads.py:68 returns the weak head first).
Ported for framework completeness: the supervised Fast R-CNN stage
(losses/fast_rcnn.py, executed-reference parity) composed with the
round-4 mask/keypoint heads under one module with the reference's loss
dict names (loss_classifier/loss_box_reg/loss_mask/loss_kp).

TPU-first: operates on POOLED RoI features [B, P, r, r, C] + padded gt
(static shapes; the caller owns backbone + pooler, exactly like
WSODDetector's layering), positives are weights not index tensors, and
eval decoding reuses the Fast R-CNN box coder path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mask_head import MaskHead, mask_head_targets, mask_rcnn_loss
from .keypoint_head import KeypointHead, keypoint_rcnn_loss
from ..losses.fast_rcnn import prepare_fast_rcnn_targets, fast_rcnn_loss
from ..structures.boxes import decode_boxes
from ..structures.keypoints import keypoints_to_heatmap

_NORMAL001 = nn.initializers.normal(0.01)
_NORMAL0001 = nn.initializers.normal(0.001)


class FastRCNNPredictor(nn.Module):
    """cls_score + bbox_pred linears (box_head/roi_box_predictors.py:
    FastRCNNPredictor/FPNPredictor init conventions)."""

    num_classes: int
    cls_agnostic: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = x.astype(self.compute_dtype)
        cls = nn.Dense(self.num_classes, dtype=self.compute_dtype,
                       param_dtype=jnp.float32, kernel_init=_NORMAL001,
                       name="cls_score")(x)
        nreg = 8 if self.cls_agnostic else 4 * self.num_classes
        reg = nn.Dense(nreg, dtype=self.compute_dtype,
                       param_dtype=jnp.float32, kernel_init=_NORMAL0001,
                       name="bbox_pred")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class CombinedROIHeads(nn.Module):
    """box (+ mask) (+ keypoint) over pooled features.

    Train: __call__(pooled, boxes, box_mask, gt_boxes, gt_labels, gt_mask,
    train=True, gt_bitmasks=..., gt_keypoints=...) -> (losses, metrics).
    Eval: train=False -> (scores [B,P,C] softmax, decoded boxes [B,P,4C],
    mask_logits/kp_logits when enabled) — post-processing (NMS, Masker)
    stays in the engine like the reference's PostProcessor split.
    """

    num_classes: int
    neck: nn.Module                   # VGGRoINeck / ResNetRoINeck instance
    mask_on: bool = False
    keypoint_on: bool = False
    num_keypoints: int = 17
    mask_resolution: int = 14         # ROI_MASK_HEAD.RESOLUTION
    mask_conv_layers: tuple = (256, 256, 256, 256)
    mask_dilation: int = 1
    # gt_bitmasks raster scale (TPU.MASK_RASTER_STRIDE, data/collate.py)
    mask_raster_stride: float = 1.0
    fg_iou: float = 0.5
    bg_iou: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    cls_agnostic: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.pred = FastRCNNPredictor(self.num_classes, self.cls_agnostic,
                                      self.compute_dtype, name="box")
        if self.mask_on:
            self.mask = MaskHead(self.num_classes,
                                 conv_layers=self.mask_conv_layers,
                                 dilation=self.mask_dilation,
                                 compute_dtype=self.compute_dtype,
                                 name="mask")
        if self.keypoint_on:
            self.keypoint = KeypointHead(self.num_keypoints,
                                         compute_dtype=self.compute_dtype,
                                         name="keypoint")

    def mask_probs(self, pooled_flat, labels):
        """Detection-box mask pass (ref mask_head/inference.py:38-44 —
        the mask head runs on POST-NMS detections): pooled features at
        the kept boxes [N, r, r, C] + predicted labels [N] -> per-label
        sigmoid probs [N, M, M]."""
        mlog = self.mask(pooled_flat)
        n = mlog.shape[0]
        sel = mlog[jnp.arange(n), :, :, jnp.clip(labels, 0)]
        return jax.nn.sigmoid(sel)

    def kp_heatmaps(self, pooled_flat):
        """Detection-box keypoint pass: [N, r, r, C] -> logits
        [N, H, H, K] (host decode: keypoint_head.heatmaps_to_keypoints)."""
        return self.keypoint(pooled_flat)

    def __call__(self, pooled, boxes, box_mask, gt_boxes=None,
                 gt_labels=None, gt_mask=None, train: bool = False,
                 gt_bitmasks=None, gt_keypoints=None,
                 include_aux: bool = True):
        b, p = pooled.shape[:2]
        flat = pooled.reshape(b * p, *pooled.shape[2:])
        feats = self.neck(flat, train=train).reshape(b, p, -1)
        cls_logits, box_reg = self.pred(feats)

        if not train:
            scores = jax.nn.softmax(cls_logits, axis=-1)
            decoded = decode_boxes(box_reg, boxes)
            out = {"scores": scores, "boxes": decoded}
            # include_aux=False: the engine's box pass skips the per-
            # proposal aux logits ([B,P,M,M,C] at P=2048 is GBs); masks/
            # keypoints run on post-NMS detections via mask_probs/
            # kp_heatmaps instead (SupervisedRCNN.predict_masks)
            if self.mask_on and include_aux:
                mlog = self.mask(flat)
                out["mask_logits"] = mlog.reshape(b, p, *mlog.shape[1:])
            if self.keypoint_on and include_aux:
                kp = self.keypoint(flat)
                out["kp_logits"] = kp.reshape(b, p, *kp.shape[1:])
            return out

        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        tgt = prepare_fast_rcnn_targets(
            self.make_rng("augment"), boxes, box_mask, gt_boxes, gt_labels,
            gt_mask, self.fg_iou, self.bg_iou, self.batch_size_per_image,
            self.positive_fraction)
        cls_loss, box_loss, acc = fast_rcnn_loss(
            cls_logits, box_reg, tgt, self.cls_agnostic)
        losses["loss_classifier"] = cls_loss
        losses["loss_box_reg"] = box_loss
        metrics["accuracy_cls"] = acc

        if self.mask_on:
            m = self.mask_resolution
            mlog = self.mask(flat)                      # [B*P, 2r, 2r, C]
            assert mlog.shape[1] == m, (
                f"mask logits {mlog.shape[1]} != RESOLUTION {m}: set "
                f"mask_resolution = 2 * pooler resolution")
            ml, mt, mp = [], [], []
            for i in range(b):      # static python loop over batch
                lab, t, pos = mask_head_targets(
                    boxes[i], box_mask[i], gt_boxes[i], gt_labels[i],
                    gt_mask[i], gt_bitmasks[i], m, self.fg_iou, self.bg_iou,
                    raster_stride=self.mask_raster_stride)
                ml.append(lab), mt.append(t), mp.append(pos)
            losses["loss_mask"] = mask_rcnn_loss(
                mlog, jnp.concatenate(ml), jnp.concatenate(mt),
                jnp.concatenate(mp))

        if self.keypoint_on:
            from .matcher import match_proposals
            from ..structures.boxes import masked_iou

            kp_log = self.keypoint(flat)                # [B*P, H, H, K]
            hms, valids = [], []
            for i in range(b):
                # per-roi matched gt keypoints (keypoint_head/loss.py
                # prepare_targets), then project; only fg rois contribute
                iou = masked_iou(gt_boxes[i], gt_mask[i], boxes[i],
                                 box_mask[i])
                matched = match_proposals(iou, gt_mask[i], self.fg_iou,
                                          self.bg_iou)
                kp_roi = gt_keypoints[i][jnp.clip(matched, 0)]  # [P, K, 3]
                hm, valid = keypoints_to_heatmap(kp_roi, boxes[i],
                                                 kp_log.shape[1])
                fg = ((matched >= 0) & box_mask[i]
                      & tgt.pos_mask[i]).astype(valid.dtype)
                hms.append(hm), valids.append(valid * fg[:, None])
            losses["loss_kp"] = keypoint_rcnn_loss(
                kp_log, jnp.concatenate(hms), jnp.concatenate(valids))
        return losses, metrics
