"""The fully-supervised detector: backbone -> pool -> CombinedROIHeads.

Parity target: the reference's MODEL.WSOD_ON=False stack —
GeneralizedRCNN (detector/generalized_rcnn.py:23) dispatching to
build_roi_heads' supervised branch (modeling/roi_heads/roi_heads.py:61-85:
box + MASK_ON mask + KEYPOINT_ON keypoint) over any registered backbone
(modeling/backbone/backbone.py:15-78: VGG16, R-*-C4/C5, R-*-FPN,
R-*-FPN-RETINANET, FBNet). Every shipped OD-WSCL config runs the weak
path instead; this module closes the reference's config surface
(VERDICT r4 task 2) so `MODEL.WSOD_ON: False` in a YAML builds and
trains a Fast/Mask/Keypoint R-CNN end to end.

Proposals come from the Batch like the WSOD path (precomputed-proposal
regime — the reference's WSOD configs all run `FASTER_RCNN: False` with
an external proposal pickle; the supervised stack reuses that plumbing).

TPU-first: one jittable apply over the padded static Batch; multi-level
FPN pooling is the static 4-call masked design (models/fpn.py
multilevel_roi_pool) instead of dynamic per-level gathers; mask targets
are batched bilinear crops of collate-time rasters instead of the
reference's per-instance host polygon chain (models/mask_head.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .detector import Batch, _on_tpu
from .roi_heads import CombinedROIHeads
from .fpn import ResNetFPNBackbone, multilevel_roi_pool
from ..ops.roi_pool import roi_pool
from ..ops.roi_align import roi_align

# torch kaiming_uniform_(a=1) — the reference's FPN2MLP fc init
_KAIMING_U1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")

# CONV_BODY -> (family, pooler scales); FPN scales are P2..P5
# (backbone.py:15-78 registry; the RETINANET bodies live in retinanet.py)
_FPN_SCALES = (0.25, 0.125, 0.0625, 0.03125)


class FPN2MLPExtractor(nn.Module):
    """FPN2MLPFeatureExtractor (roi_box_feature_extractors.py:60-83):
    flatten pooled [N, r, r, C] -> fc6 -> fc7 (MLP_HEAD_DIM), ReLU."""

    out_dim: int = 1024
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, **_):
        x = x.reshape(x.shape[0], -1).astype(self.compute_dtype)
        x = nn.relu(nn.Dense(self.out_dim, dtype=self.compute_dtype,
                             param_dtype=jnp.float32,
                             kernel_init=_KAIMING_U1, name="fc6")(x))
        x = nn.relu(nn.Dense(self.out_dim, dtype=self.compute_dtype,
                             param_dtype=jnp.float32,
                             kernel_init=_KAIMING_U1, name="fc7")(x))
        return x


class SupervisedRCNN(nn.Module):
    """Config fields mirror the reference YAML keys (detector_from_cfg's
    supervised sibling, built by models.build_model on WSOD_ON=False)."""

    num_classes: int = 81
    backbone_arch: str = "R-50-FPN"
    mask_on: bool = False
    keypoint_on: bool = False
    num_keypoints: int = 17
    mask_resolution: int = 14
    mask_conv_layers: Tuple[int, ...] = (256, 256, 256, 256)
    mask_dilation: int = 1
    pooler_method: str = "ROIPool"
    pooler_resolution: int = 7
    pooler_scale: float = 0.0625          # single-level bodies
    pooler_sampling: int = 2
    pooler_win: int = 32
    mlp_dim: int = 1024
    fg_iou: float = 0.5
    bg_iou: float = 0.5
    roi_batch_size: int = 512
    roi_pos_fraction: float = 0.25
    cls_agnostic_bbox_reg: bool = False
    mask_raster_stride: float = 4.0
    fbnet_arch_def: Optional[str] = None  # MODEL.FBNET.ARCH_DEF JSON
    compute_dtype: str = "bfloat16"

    def setup(self):
        dtype = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                 else jnp.float32)
        self._dtype = dtype
        arch = self.backbone_arch
        self._is_fpn = arch.endswith("-FPN")
        if arch.startswith("VGG16"):
            from .vgg16 import VGGBackbone, VGGRoINeck
            self.backbone = VGGBackbone(arch=arch, compute_dtype=dtype)
            neck = VGGRoINeck(hidden_dim=self.mlp_dim, compute_dtype=dtype)
        elif self._is_fpn:
            depth = "-".join(arch.split("-")[:2])
            self.backbone = ResNetFPNBackbone(depth=depth,
                                              compute_dtype=dtype)
            neck = FPN2MLPExtractor(out_dim=self.mlp_dim,
                                    compute_dtype=dtype)
        elif arch.startswith("R-"):
            from .resnet import ResNetBackbone, ResNetRoINeck
            depth = "-".join(arch.split("-")[:2])
            stages_out = 5 if arch.endswith("C5") else 4
            self.backbone = ResNetBackbone(depth=depth,
                                           stages_out=stages_out,
                                           compute_dtype=dtype)
            neck = ResNetRoINeck(mid_dim=2048, out_dim=self.mlp_dim,
                                 compute_dtype=dtype)
        elif arch.startswith("FBNet"):
            from .fbnet import FBNetTrunk
            name = arch.split("-", 1)[1] if "-" in arch else "default"
            self.backbone = FBNetTrunk(arch=name,
                                       arch_def=self.fbnet_arch_def,
                                       compute_dtype=dtype)
            neck = FPN2MLPExtractor(out_dim=self.mlp_dim,
                                    compute_dtype=dtype)
        else:
            raise ValueError(f"Unknown backbone {arch!r}")
        self.roi_heads = CombinedROIHeads(
            num_classes=self.num_classes, neck=neck, mask_on=self.mask_on,
            keypoint_on=self.keypoint_on, num_keypoints=self.num_keypoints,
            mask_resolution=self.mask_resolution,
            mask_conv_layers=tuple(self.mask_conv_layers),
            mask_dilation=self.mask_dilation,
            fg_iou=self.fg_iou, bg_iou=self.bg_iou,
            batch_size_per_image=self.roi_batch_size,
            positive_fraction=self.roi_pos_fraction,
            cls_agnostic=self.cls_agnostic_bbox_reg,
            mask_raster_stride=self.mask_raster_stride,
            compute_dtype=dtype, name="roi_heads")

    def pool(self, feats, boxes, mask, scale, need_grad: bool = False):
        """Single-level pooling; same Pallas-kernel pathway as
        WSODDetector.pool (detector.py:179-199)."""
        if self.pooler_method == "ROIPool":
            if self.pooler_resolution == 7 and _on_tpu():
                from ..ops import roi_pool_pallas as rp
                b, h, w, c = feats.shape
                isz = jnp.dtype(feats.dtype).itemsize
                ok = rp.pallas_pool_feasible(h, w, c, isz)
                if need_grad:
                    ok = ok and rp.pallas_pool_bwd_feasible(h, w, c, isz)
                if ok:
                    return rp.roi_pool_tpu(feats, boxes, mask, scale)
            return roi_pool(feats, boxes, mask, scale,
                            self.pooler_resolution, self.pooler_win)
        return roi_align(feats, boxes, mask, scale,
                         self.pooler_resolution, self.pooler_sampling)

    def _pooled(self, batch: Batch, need_grad: bool):
        feats = self.backbone(batch.images)
        if self._is_fpn:
            return multilevel_roi_pool(
                lambda f, bx, m, s: self.pool(f, bx, m, s, need_grad),
                feats[:4], _FPN_SCALES, batch.boxes, batch.box_mask)
        return self.pool(feats, batch.boxes, batch.box_mask,
                         self.pooler_scale, need_grad)

    def __call__(self, batch: Batch, train: bool = False,
                 calibrate: bool = False):
        pooled = self._pooled(batch, need_grad=train)
        if train:
            if batch.gt_boxes is None:
                raise ValueError("supervised training needs Batch gt_boxes "
                                 "(collate include_gt; WSOD_ON=False)")
            return self.roi_heads(
                pooled, batch.boxes, batch.box_mask, batch.gt_boxes,
                batch.gt_labels, batch.gt_mask, train=True,
                gt_bitmasks=batch.gt_bitmasks,
                gt_keypoints=batch.gt_keypoints)
        # box pass only: masks/keypoints run on post-NMS detections
        # (predict_masks / predict_kp_heatmaps), like the reference's
        # cascaded mask inference — never [B, P, M, M, C] at P=2048
        return self.roi_heads(pooled, batch.boxes, batch.box_mask,
                              train=False, include_aux=False)

    def predict_masks(self, batch: Batch, det_boxes, det_labels):
        """Detection-box mask pass (ref mask_head/inference.py + the
        CombinedROIHeads cascade: the mask head pools at the POST-NMS
        detection boxes). det_boxes [B, K, 4] (transformed frame),
        det_labels [B, K] -> sigmoid probs [B, K, M, M]."""
        b, k = det_boxes.shape[:2]
        dmask = jnp.ones((b, k), bool)
        feats = self.backbone(batch.images)
        if self._is_fpn:
            pooled = multilevel_roi_pool(
                lambda f, bx, m, s: self.pool(f, bx, m, s, False),
                feats[:4], _FPN_SCALES, det_boxes, dmask)
        else:
            pooled = self.pool(feats, det_boxes, dmask, self.pooler_scale)
        flat = pooled.reshape(b * k, *pooled.shape[2:])
        probs = self.roi_heads.mask_probs(flat, det_labels.reshape(-1))
        return probs.reshape(b, k, *probs.shape[1:])

    def predict_kp_heatmaps(self, batch: Batch, det_boxes):
        """Detection-box keypoint pass -> logits [B, K, H, H, Knum]
        (host decode: keypoint_head.heatmaps_to_keypoints)."""
        b, k = det_boxes.shape[:2]
        dmask = jnp.ones((b, k), bool)
        feats = self.backbone(batch.images)
        if self._is_fpn:
            pooled = multilevel_roi_pool(
                lambda f, bx, m, s: self.pool(f, bx, m, s, False),
                feats[:4], _FPN_SCALES, det_boxes, dmask)
        else:
            pooled = self.pool(feats, det_boxes, dmask, self.pooler_scale)
        flat = pooled.reshape(b * k, *pooled.shape[2:])
        hm = self.roi_heads.kp_heatmaps(flat)
        return hm.reshape(b, k, *hm.shape[1:])

    def init_all(self, batch: Batch):
        """Cheap initializer: the eval forward touches every submodule
        (backbone, neck, box/mask/keypoint heads) without the target-prep
        graph (engine/trainer.py create_train_state)."""
        pooled = self._pooled(batch, need_grad=False)
        return self.roi_heads(pooled, batch.boxes, batch.box_mask,
                              train=False, include_aux=True)


def supervised_from_cfg(cfg) -> SupervisedRCNN:
    mask_res = cfg.MODEL.ROI_MASK_HEAD.RESOLUTION
    pool_res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
    if cfg.MODEL.MASK_ON and mask_res != 2 * pool_res:
        # shared box pooler + 2x deconv predictor (models/roi_heads.py)
        raise ValueError(
            f"ROI_MASK_HEAD.RESOLUTION={mask_res} must equal 2x "
            f"ROI_BOX_HEAD.POOLER_RESOLUTION={pool_res} (the mask head "
            "shares the box pooler; its deconv doubles the side)")
    return SupervisedRCNN(
        num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
        backbone_arch=cfg.MODEL.BACKBONE.CONV_BODY,
        mask_on=cfg.MODEL.MASK_ON,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES,
        mask_resolution=mask_res,
        mask_conv_layers=tuple(cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS),
        mask_dilation=cfg.MODEL.ROI_MASK_HEAD.DILATION,
        pooler_method=cfg.MODEL.ROI_BOX_HEAD.POOLER_METHOD,
        pooler_resolution=pool_res,
        pooler_scale=cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES[0],
        pooler_sampling=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        pooler_win=cfg.TPU.POOLER_WIN,
        mlp_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
        fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
        bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
        roi_batch_size=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_pos_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        cls_agnostic_bbox_reg=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
        mask_raster_stride=float(cfg.TPU.MASK_RASTER_STRIDE),
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
    )
