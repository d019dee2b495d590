"""The WSOD detector: backbone -> RoI pool -> neck -> heads (+ full loss).

Reference composition: GeneralizedRCNN (detector/generalized_rcnn.py:23) with
ROIWeakRegHead (weak_head/weak_head.py:72) — precomputed proposals, no RPN
(``FASTER_RCNN: False`` in every shipped config). Train forward implements
weak_head.py:101-122 + loss.py:233-411 (RoIRegLoss) end to end inside one
jittable apply; eval forward implements the ``testing_forward`` heuristics
(weak_head.py:124-145).

Static-shape batched layout everywhere: images [B,H,W,3] NHWC padded,
proposals [B,P,4] + mask. No per-image Python loops — see losses/ for the
batched mining/pseudo-labeling that replaces the reference's host loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..ops.roi_pool import roi_pool
from ..ops.roi_align import roi_align
from ..ops.dropblock import dropblock_2d, noise_augment
from ..structures.boxes import decode_boxes, clip_to_image
from ..losses import (stage_a, stage_b, assemble_bank, supcon_loss,
                      supcon_v2_loss, od_layer, oicr_layer, mist_layer,
                      wsddn_final_score, mil_loss, refinement_cls_loss,
                      refinement_reg_loss, avg_image_accuracy)
from .vgg16 import VGGBackbone, VGGRoINeck
from .sim_net import SimNet
from .predictors import PREDICTORS


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interp() -> bool:
    """Pallas interpret-mode tests run the TPU-only kernels on CPU."""
    import os
    return os.environ.get("ODWSCL_PALLAS_INTERPRET") == "1"


@struct.dataclass
class Batch:
    """One padded training/eval batch (replaces ImageList + BoxList lists)."""

    images: jnp.ndarray       # [B, H, W, 3] normalized (BGR*255 - mean)
    image_sizes: jnp.ndarray  # [B, 2] (h, w) before padding
    boxes: jnp.ndarray        # [B, P, 4] xyxy proposals
    box_mask: jnp.ndarray     # [B, P]
    labels: Optional[jnp.ndarray] = None  # [B, C] image-level, col 0 = 0
    # partial-label supervision (PARTIAL_LABELS point/scribble,
    # reference loss.py:208-231 + coco.py:155-172); None when unused
    clicks: Optional[jnp.ndarray] = None           # [B, K, 2] (x, y)
    click_labels: Optional[jnp.ndarray] = None     # [B, K] int32
    click_mask: Optional[jnp.ndarray] = None       # [B, K] bool
    scribbles: Optional[jnp.ndarray] = None        # [B, S, 4] xyxy
    scribble_labels: Optional[jnp.ndarray] = None  # [B, S] int32
    scribble_mask: Optional[jnp.ndarray] = None    # [B, S] bool
    # fully-supervised instance GT (MODEL.WSOD_ON=False path; the
    # reference's per-image BoxList targets, padded to TPU.GT_PAD slots).
    # None on every WSOD config — the weak path sees image labels only.
    gt_boxes: Optional[jnp.ndarray] = None         # [B, G, 4] xyxy
    gt_labels: Optional[jnp.ndarray] = None        # [B, G] int32
    gt_mask: Optional[jnp.ndarray] = None          # [B, G] bool
    # MASK_ON: per-instance bitmasks rasterized at collate time at
    # 1/TPU.MASK_RASTER_STRIDE of the padded canvas (data/collate.py)
    gt_bitmasks: Optional[jnp.ndarray] = None      # [B, G, Hs, Ws] f32
    # KEYPOINT_ON: (x, y, visibility) per instance keypoint
    gt_keypoints: Optional[jnp.ndarray] = None     # [B, G, K, 3] f32


class WSODDetector(nn.Module):
    """Flagship model. Config fields mirror the reference YAML keys."""

    num_classes: int = 21
    backbone_arch: str = "VGG16-OICR"
    predictor: str = "MISTPredictor"
    num_refs: int = 3
    pooler_method: str = "ROIPool"
    pooler_resolution: int = 7
    pooler_scale: float = 0.125
    pooler_sampling: int = 2
    pooler_win: int = 32
    mlp_dim: int = 4096
    db_method: str = "dropblock"      # none | dropblock | concrete
    db_size: int = 3
    db_prob: float = 0.3
    cdb_tau: float = 0.3              # DB.TAU
    cdb_gsm_thres: float = 0.01       # DB.GSM_THRES
    cdb_is_hard: bool = True          # DB.IS_HARD
    cls_agnostic_bbox_reg: bool = False
    regress_on: bool = True
    regress_heur: str = "AVG"
    contra: bool = True
    oicr_p: float = 0.0
    partial_labels: str = "none"      # ROI_WEAK_HEAD.PARTIAL_LABELS
    roi_refine: bool = False          # ROI_WEAK_HEAD.ROI_LOSS_REFINE
    # paper hyperparameters (reference defaults.py:540-551)
    p_thres: float = 0.5              # cfg.thres
    mining_nms: float = 0.1           # cfg.nms
    lmda: float = 0.1                 # cfg.lmda
    temperature: float = 0.2          # cfg.temp
    loss_type: str = "supconv2"       # cfg.loss
    fg_iou: float = 0.5               # ROI_HEADS.FG_IOU_THRESHOLD
    bg_iou: float = 0.5               # ROI_HEADS.BG_IOU_THRESHOLD
    roi_batch_size: int = 512         # ROI_HEADS.BATCH_SIZE_PER_IMAGE
    roi_pos_fraction: float = 0.25    # ROI_HEADS.POSITIVE_FRACTION
    reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    # TPU knobs
    cap_a: int = 768
    cap_b: int = 256
    gt_cap: int = 128
    compute_dtype: str = "bfloat16"
    int8_eval: bool = False           # TPU.INT8_EVAL: quantized serving path
    int8_eval_convs: bool = False     # TPU.INT8_EVAL_CONVS: int8 conv stack
    int8_static: bool = False         # TPU.INT8_STATIC: calibrated scales
    int8_bf16_layers: Tuple[int, ...] = ()  # TPU.INT8_BF16_LAYERS fallback
    s2d_stem: bool = False            # TPU.S2D_STEM: exact s2d first block
    neck_dropout: float = 0.5         # fc6/fc7 dropout (vgg16.py classifier)
    # FASTER_RCNN=True: CAM-attention proposal generation instead of
    # precomputed rois (rpn.py:154-190 + cam.py; see models/cam_proposals)
    faster_rcnn: bool = False
    rpn_post_nms: int = 512           # TPU.RPN_POST_NMS (ref: 2000)
    # backward pruned at the freeze boundary (MODEL.BACKBONE.
    # FREEZE_CONV_BODY_AT -> conv count; torch requires_grad=False parity)
    freeze_convs: int = 4

    def setup(self):
        if self.db_method not in ("none", "dropblock", "concrete"):
            # go_through_cdb's remaining branch, DB.METHOD='attention'
            # (weak_head.py:96-97), instantiates Attention_DropBlock
            # (backbone/vgg16.py:136) — a class never defined or imported
            # anywhere in the reference, so that config crashes with
            # NameError at model build there. Fail loudly here instead of
            # silently degrading to 'none'.
            raise ValueError(
                f"DB.METHOD={self.db_method!r} is not supported: the "
                "reference's 'attention' branch is dead code (undefined "
                "Attention_DropBlock, vgg16.py:136); use none|dropblock|"
                "concrete")
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        if self.backbone_arch.startswith("VGG16"):
            self.backbone = VGGBackbone(arch=self.backbone_arch,
                                        compute_dtype=dtype,
                                        int8_eval=self.int8_eval_convs,
                                        int8_static=self.int8_static,
                                        int8_bf16_layers=self.int8_bf16_layers,
                                        s2d_stem=self.s2d_stem,
                                        freeze_at=self.freeze_convs)
            self.neck = VGGRoINeck(hidden_dim=self.mlp_dim, compute_dtype=dtype,
                                   int8_eval=self.int8_eval,
                                   dropout_rate=self.neck_dropout)
        elif self.backbone_arch.startswith("R-"):
            from .resnet import ResNetBackbone, ResNetRoINeck
            depth = "-".join(self.backbone_arch.split("-")[:2])
            stages_out = 5 if self.backbone_arch.endswith("C5") else 4
            self.backbone = ResNetBackbone(depth=depth, stages_out=stages_out,
                                           compute_dtype=dtype)
            self.neck = ResNetRoINeck(mid_dim=2048, out_dim=self.mlp_dim,
                                      compute_dtype=dtype)
        else:
            raise ValueError(f"Unknown backbone {self.backbone_arch}")
        if self.faster_rcnn:
            from .cam import CAMModule
            self.cam = CAMModule(num_classes=self.num_classes,
                                 compute_dtype=dtype)
        self.sim_net = SimNet(compute_dtype=dtype)
        pred_cls = PREDICTORS[self.predictor]
        kwargs = dict(num_classes=self.num_classes, compute_dtype=dtype)
        if self.predictor != "WSDDNPredictor":
            kwargs["num_refs"] = self.num_refs
        if self.predictor == "MISTPredictor":
            kwargs["cls_agnostic_bbox_reg"] = self.cls_agnostic_bbox_reg
        self.pred = pred_cls(**kwargs)
        if self.db_method == "concrete":
            from .cdb import ConvConcreteDB
            self.cdb = ConvConcreteDB(drop_prob=self.cdb_tau,
                                      block_size=self.db_size,
                                      gsm_tau=self.cdb_gsm_thres,
                                      is_hard=self.cdb_is_hard, name="cdb")

    # -- building blocks ------------------------------------------------------
    def pool(self, feats: jnp.ndarray, boxes: jnp.ndarray,
             mask: jnp.ndarray, need_grad: bool = False) -> jnp.ndarray:
        """RoI pooling. On TPU the Pallas kernel (exact for every roi size,
        custom argmax VJP) serves both train and eval whenever the feature
        block fits VMEM; oversized maps (the biggest TTA scales) use the
        XLA pooler, exact up to `pooler_win` cells per axis."""
        if self.pooler_method == "ROIPool":
            if self.pooler_resolution == 7 and _on_tpu():
                from ..ops import roi_pool_pallas as rp
                b, h, w, c = feats.shape
                isz = jnp.dtype(feats.dtype).itemsize
                ok = rp.pallas_pool_feasible(h, w, c, isz)
                if need_grad:
                    ok = ok and rp.pallas_pool_bwd_feasible(h, w, c, isz)
                if ok:
                    return rp.roi_pool_tpu(feats, boxes, mask,
                                           self.pooler_scale)
            return roi_pool(feats, boxes, mask, self.pooler_scale,
                            self.pooler_resolution, self.pooler_win)
        return roi_align(feats, boxes, mask, self.pooler_scale,
                         self.pooler_resolution, self.pooler_sampling)

    def _neck_flat(self, pooled: jnp.ndarray, train: bool,
                   row_ids: jnp.ndarray | None = None,
                   row_key: jnp.ndarray | None = None) -> jnp.ndarray:
        """pooled [N, r, r, C] -> [N, D]. ``(row_ids, row_key)`` selects
        per-row-seeded dropout (vgg16.py VGGRoINeck) so a gathered-row
        recompute reproduces the all-roi pass bit-for-bit."""
        return self.neck(pooled, train=train, row_ids=row_ids,
                         row_key=row_key)

    # -- eval -----------------------------------------------------------------
    def __call__(self, batch: Batch, train: bool = False,
                 calibrate: bool = False):
        if train:
            return self.train_forward(batch)
        return self.eval_forward(batch, calibrate=calibrate)

    def init_all(self, batch: Batch):
        """Cheap initializer: touches every submodule (backbone, neck,
        sim net, predictor, cdb) WITHOUT the loss/mining graph, so
        parameter trees are created in seconds instead of compiling the full
        train step. Only needs the 'params' rng."""
        feats = self.backbone(batch.images)
        if self.faster_rcnn:
            _ = self.cam(feats, batch.labels)
        pooled = self.pool(feats, batch.boxes, batch.box_mask)
        b, p = pooled.shape[:2]
        flat = pooled.reshape(b * p, *pooled.shape[2:])
        clean = self._neck_flat(flat, train=False)
        z = self.sim_net(clean)
        out = self.pred(clean.reshape(b, p, -1), batch.box_mask, train=True)
        if self.db_method == "concrete":
            # train=True so the conv params are created (train=False is an
            # early-return identity); needs the 'augment' rng at init
            _ = self.cdb(flat, batch.box_mask.reshape(-1), train=True)
        return z, out

    def eval_forward(self, batch: Batch, calibrate: bool = False):
        """Returns (scores [B,P,C], boxes) per the REGRESS_HEUR heuristic
        (weak_head.py:124-145). For AVG, boxes are the decoded per-class
        regressed boxes [B,P,4C] clipped to the image; otherwise the raw
        proposals [B,P,4]. ``calibrate`` runs the int8 conv stack in bf16
        while recording activation scales into the "quant" collection
        (apply with mutable=["quant"]; see vgg16.py int8_static)."""
        if self.backbone_arch.startswith("VGG16"):
            use_fast = self.int8_eval_convs
            feats = self.backbone(batch.images, fast_eval=use_fast,
                                  calibrate=calibrate and use_fast)
        else:
            feats = self.backbone(batch.images)
        pooled = self.pool(feats, batch.boxes, batch.box_mask)
        b, p = pooled.shape[:2]
        clean = self._neck_flat(pooled.reshape(b * p, *pooled.shape[2:]),
                                train=False).reshape(b, p, -1)
        cls, det, refs, bbox = self.pred(clean, batch.box_mask, train=False)

        if self.predictor == "WSDDNPredictor" or self.regress_heur == "WSDDN":
            scores = cls * det if refs is None else cls * det
            return scores, batch.boxes
        if self.regress_heur == "CLS-AVG" or not self.regress_on:
            scores = jnp.mean(jnp.stack(refs), axis=0)
            return scores, batch.boxes
        if self.regress_heur == "UNION":
            # each branch contributes its own copy of the proposals
            # (weak_head.py:135-142); the engine tiles box_mask to match
            scores = jnp.concatenate(refs, axis=1)              # [B,RP,C]
            deltas = jnp.concatenate(bbox, axis=1).astype(jnp.float32)
            boxes_rep = jnp.concatenate([batch.boxes] * len(refs), axis=1)
            if self.cls_agnostic_bbox_reg:
                deltas = deltas[..., -4:]
            dec = decode_boxes(deltas, boxes_rep, self.reg_weights)
            rp_ = dec.shape[1]
            k = dec.shape[-1] // 4
            dec = dec.reshape(b, rp_, k, 4)
            dec = clip_to_image(dec, batch.image_sizes[:, None, None, :])
            if self.cls_agnostic_bbox_reg:
                dec = jnp.broadcast_to(dec, (b, rp_, self.num_classes, 4))
            return scores, dec.reshape(b, rp_, -1)
        # AVG (default in all shipped configs)
        scores = jnp.mean(jnp.stack(refs), axis=0)              # [B,P,C]
        deltas = jnp.mean(jnp.stack(bbox), axis=0).astype(jnp.float32)
        if self.cls_agnostic_bbox_reg:
            deltas = deltas[..., -4:]
        dec = decode_boxes(deltas, batch.boxes, self.reg_weights)  # [B,P,4K]
        k = dec.shape[-1] // 4
        dec = dec.reshape(b, p, k, 4)
        dec = clip_to_image(dec, batch.image_sizes[:, None, None, :])
        if self.cls_agnostic_bbox_reg:
            dec = jnp.broadcast_to(dec, (b, p, self.num_classes, 4))
        return scores, dec.reshape(b, p, -1)

    # -- train ----------------------------------------------------------------
    def train_forward(self, batch: Batch
                      ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        boxes, mask, labels = batch.boxes, batch.box_mask, batch.labels
        # partial labels: balanced FG/BG proposal subsampling BEFORE feature
        # extraction (weak_head.py:103-105 -> roi_sampler.py:16) — the
        # trained-on proposal set shrinks to ROI_HEADS.BATCH_SIZE_PER_IMAGE
        if self.partial_labels == "point" and batch.clicks is not None:
            from .roi_sampler import match_labels_point, subsample_proposals
            plab = match_labels_point(boxes, batch.clicks, batch.click_labels,
                                      batch.click_mask)
            boxes, mask, _ = subsample_proposals(
                self.make_rng("augment"), boxes, mask, plab,
                self.roi_batch_size, self.roi_pos_fraction)
        elif self.partial_labels == "scribble" and batch.scribbles is not None:
            from .roi_sampler import (match_labels_scribble,
                                      subsample_proposals)
            plab = match_labels_scribble(boxes, batch.scribbles,
                                         batch.scribble_labels,
                                         batch.scribble_mask,
                                         self.fg_iou, self.bg_iou)
            boxes, mask, _ = subsample_proposals(
                self.make_rng("augment"), boxes, mask, plab,
                self.roi_batch_size, self.roi_pos_fraction)
        feats = self.backbone(batch.images)
        cam_loss = None
        if self.faster_rcnn:
            # CAM-attention proposals (rpn.py:154-190); image-level CAM BCE
            # trains the attention (cam.py:6-47)
            from .cam_proposals import cam_to_proposals
            cam_maps, cam_loss = self.cam(feats, labels)
            # mean attention logit over FG classes (rpn.py:188 pools
            # atten_logits[:,1:].mean(1))
            atten = cam_maps.astype(jnp.float32)[..., 1:].mean(axis=-1)
            boxes, mask, _ = cam_to_proposals(
                atten, batch.image_sizes, int(round(1 / self.pooler_scale)),
                out_p=self.rpn_post_nms)
            boxes = jax.lax.stop_gradient(boxes)
        pooled = self.pool(feats, boxes, mask, need_grad=True)  # [B,P,r,r,C]
        b, p = pooled.shape[:2]
        flat_pooled = pooled.reshape(b * p, *pooled.shape[2:])

        z_clean = None
        clean_row_key = None
        if self.contra:
            # All-roi clean pass = MINING VIEW ONLY (stop_gradient): the
            # loss touches the clean neck solely through the <= capA+capB
            # mined bank rows, which are recomputed differentiably after
            # stage_b with bit-identical per-row dropout masks (row_key is
            # drawn once and shared), so the full-size fc6/fc7 backward is
            # never built. Gradients are exactly those of the naive
            # all-roi differentiable pass (up to GEMM tiling ulps).
            # Reference semantics preserved: mining and loss read the SAME
            # dropout realization (weak_head.py computes one clean pass).
            clean_row_key = self.make_rng("dropout")
            row_ids = jnp.arange(b * p, dtype=jnp.int32)
            clean_ng = jax.lax.stop_gradient(self._neck_flat(
                flat_pooled, train=True, row_ids=row_ids,
                row_key=clean_row_key))
            z_clean = jax.lax.stop_gradient(
                self.sim_net(clean_ng)).reshape(b, p, -1)

        # augmented predictor input (go_through_cdb, weak_head.py:87-99)
        if self.db_method == "dropblock":
            aug_pooled = dropblock_2d(self.make_rng("augment"), flat_pooled,
                                      self.db_prob, self.db_size,
                                      valid=mask.reshape(-1))
        elif self.db_method == "concrete":
            aug_pooled = self.cdb(flat_pooled, mask.reshape(-1), train=True)
        else:  # none
            aug_pooled = flat_pooled
        aug = self._neck_flat(aug_pooled, train=True).reshape(b, p, -1)
        cls, det, refs, bbox = self.pred(aug, mask, train=True)

        final = wsddn_final_score(cls, det, mask)               # [B,P,C] f32

        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        if cam_loss is not None:
            losses["loss_cam"] = cam_loss
        losses["loss_img"] = mil_loss(final, labels)
        img_score = jnp.clip(final.sum(axis=1), 1e-8, 1 - 1e-8)
        metrics["acc_img"] = avg_image_accuracy(jnp.clip(labels, 0, 1),
                                                img_score)
        if refs is None:
            # WSDDN-only training: just the MIL BCE, no refinement branches
            # and no mining (weak_head/loss.py:50-95 WSDDNLossComputation)
            return losses, metrics

        ref_softmax = jnp.stack(
            [jax.nn.softmax(r.astype(jnp.float32), axis=-1) for r in refs])
        labels_fg = labels[:, 1:] > 0

        pgt_instance = None
        if self.contra:
            a = stage_a(boxes, mask, labels_fg,
                        jax.lax.stop_gradient(final),
                        jax.lax.stop_gradient(ref_softmax),
                        self.p_thres, self.cap_a)
            slot_pooled = pooled[jnp.clip(a.slot_b, 0), a.slot_p]  # [capA,...]
            dropped = dropblock_2d(self.make_rng("augment"), slot_pooled,
                                   0.3, 1, valid=a.slot_valid)
            z_drop = self.sim_net(self._neck_flat(dropped, train=True))
            noised = noise_augment(self.make_rng("augment"), slot_pooled)
            z_noise = self.sim_net(self._neck_flat(noised, train=True))

            sb = stage_b(boxes, mask, labels_fg,
                         jax.lax.stop_gradient(final),
                         jax.lax.stop_gradient(ref_softmax),
                         z_clean,
                         jax.lax.stop_gradient(z_drop),
                         jax.lax.stop_gradient(z_noise),
                         a, self.mining_nms, self.cap_b)
            # differentiable recompute of the clean neck + sim head on the
            # mined bank rows only (same row_key -> identical dropout masks
            # as the stop_gradient'd all-roi pass above)
            rows_a = (jnp.clip(a.slot_b, 0) * p + a.slot_p).astype(jnp.int32)
            rows_b = (jnp.clip(sb.slot_b, 0) * p
                      + sb.slot_p).astype(jnp.int32)
            rows = jnp.concatenate([rows_a, rows_b])
            bank_clean = self._neck_flat(flat_pooled[rows], train=True,
                                         row_ids=rows,
                                         row_key=clean_row_key)
            z_bank = self.sim_net(bank_clean)
            feats_e, labels_e, hard_e, valid_e = assemble_bank(
                a, sb, z_clean, z_drop, z_noise,
                z_a_clean=z_bank[:rows_a.shape[0]],
                z_b_clean=z_bank[rows_a.shape[0]:])
            if self.loss_type == "supconv2":
                sim = supcon_v2_loss(feats_e, labels_e, hard_e, valid_e,
                                     self.temperature)
            else:
                sim = supcon_loss(feats_e, labels_e, valid_e,
                                  self.temperature)
            losses["loss_sim"] = self.lmda * sim
            metrics["bank_overflow"] = (a.overflow + sb.overflow).astype(jnp.float32)
            # integer mining signature: bank sizes + mined pgt-instance set
            # size. Discrete pGT diagnostics in the spirit of the
            # reference's cal_precision_recall (utils/utils.py:71); also the
            # flip detector for cross-sharding drift tests (two layouts
            # computed the same discrete mining decisions iff these match).
            metrics["n_bank"] = jnp.sum(valid_e).astype(jnp.float32)
            metrics["n_mined"] = jnp.sum(sb.pgt_instance).astype(jnp.float32)
            pgt_instance = sb.pgt_instance

        # refinement branches (loss.py:356-394)
        for i in range(self.num_refs):
            src = final if i == 0 else ref_softmax[i - 1]
            fg_scores = jax.lax.stop_gradient(src[..., 1:])     # [B,P,C-1]
            if self.contra:
                pl = od_layer(boxes, mask, fg_scores, labels_fg,
                              pgt_instance[i], self.fg_iou, self.gt_cap,
                              self.reg_weights)
            elif self.oicr_p == 0.0:
                pl = oicr_layer(boxes, mask, fg_scores, labels_fg,
                                self.fg_iou, reg_weights=self.reg_weights)
            else:
                pl = mist_layer(boxes, mask, fg_scores, labels_fg,
                                portion=self.oicr_p, fg_iou=self.fg_iou,
                                reg_weights=self.reg_weights)
            # partial-label refinement (loss.py:371 when ROI_LOSS_REFINE)
            if (self.partial_labels == "point" and self.roi_refine
                    and batch.clicks is not None):
                from ..losses.partial_labels import filter_pseudo_labels_point
                pl = pl._replace(labels=filter_pseudo_labels_point(
                    pl.labels, boxes, batch.clicks, batch.click_labels,
                    batch.click_mask))
            elif (self.partial_labels == "scribble" and self.roi_refine
                    and batch.scribbles is not None):
                from ..losses.partial_labels import (
                    filter_pseudo_labels_scribble)
                pl = pl._replace(labels=filter_pseudo_labels_scribble(
                    pl.labels, boxes, batch.scribbles, batch.scribble_labels,
                    batch.scribble_mask))
            lam = 3.0 if i == 0 else 1.0
            losses[f"loss_ref_cls{i}"] = lam * refinement_cls_loss(
                refs[i], pl.labels, pl.weights, mask)
            if self.regress_on and bbox is not None:
                losses[f"loss_ref_reg{i}"] = lam * refinement_reg_loss(
                    bbox[i], pl.labels, pl.weights, pl.reg_targets, mask,
                    self.cls_agnostic_bbox_reg)
            metrics[f"pgt_overflow{i}"] = pl.overflow.astype(jnp.float32)
            # discrete per-branch pseudo-label count (flip signature)
            metrics[f"n_pos{i}"] = jnp.sum(
                (pl.labels > 0) & mask).astype(jnp.float32)

        # image-classification accuracies (loss.py:396-400)
        for i in range(self.num_refs):
            ref_sum = jnp.where(mask[..., None], refs[i].astype(jnp.float32),
                                0.0).sum(axis=1)
            metrics[f"acc_ref{i}"] = avg_image_accuracy(
                jnp.clip(labels[:, 1:], 0, 1), ref_sum[:, 1:])
        return losses, metrics


def detector_from_cfg(cfg) -> WSODDetector:
    """Build the flagship detector from a CfgNode (the reference's
    build_detection_model equivalent for the WSOD path)."""
    return WSODDetector(
        num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
        backbone_arch=cfg.MODEL.BACKBONE.CONV_BODY,
        predictor=cfg.MODEL.ROI_WEAK_HEAD.PREDICTOR,
        num_refs=cfg.MODEL.ROI_WEAK_HEAD.NUM_REFS,
        pooler_method=cfg.MODEL.ROI_BOX_HEAD.POOLER_METHOD,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        pooler_scale=cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES[0],
        pooler_sampling=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        mlp_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
        db_method=cfg.DB.METHOD,
        db_size=cfg.DB.SIZE,
        cls_agnostic_bbox_reg=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
        regress_on=cfg.MODEL.ROI_WEAK_HEAD.REGRESS_ON,
        regress_heur=cfg.MODEL.ROI_WEAK_HEAD.REGRESS_HEUR,
        contra=cfg.SOLVER.CONTRA,
        oicr_p=cfg.MODEL.ROI_WEAK_HEAD.OICR_P,
        partial_labels=cfg.MODEL.ROI_WEAK_HEAD.PARTIAL_LABELS,
        roi_refine=cfg.MODEL.ROI_WEAK_HEAD.ROI_LOSS_REFINE,
        p_thres=cfg.thres,
        mining_nms=cfg.nms,
        lmda=cfg.lmda,
        temperature=cfg.temp,
        loss_type=cfg.loss,
        fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
        bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
        roi_batch_size=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_pos_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
        pooler_win=cfg.TPU.POOLER_WIN,
        cap_a=cfg.TPU.BANK_CAPACITY,
        cap_b=max(cfg.TPU.BANK_CAPACITY // 4, 64),
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        int8_eval=cfg.TPU.INT8_EVAL,
        int8_eval_convs=cfg.TPU.INT8_EVAL_CONVS,
        int8_static=cfg.TPU.INT8_STATIC,
        int8_bf16_layers=tuple(cfg.TPU.INT8_BF16_LAYERS),
        s2d_stem=cfg.TPU.S2D_STEM,
        faster_rcnn=cfg.MODEL.FASTER_RCNN,
        rpn_post_nms=cfg.TPU.RPN_POST_NMS,
        freeze_convs=_freeze_count(cfg),
    )


def _freeze_count(cfg) -> int:
    """FREEZE_CONV_BODY_AT -> pruned conv count (vgg16.py:48-55)."""
    at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    if at <= 0 or not cfg.MODEL.BACKBONE.CONV_BODY.startswith("VGG"):
        return 0
    from .vgg16 import FREEZE_CONV_COUNTS
    return FREEZE_CONV_COUNTS[at - 1]
