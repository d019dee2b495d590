"""Feature Pyramid Network backbone family + multi-level RoI assignment.

Parity target: wetectron/modeling/backbone/fpn.py (FPN, LastLevelMaxPool,
LastLevelP6P7) + backbone.py:30-78 (build_resnet_fpn_backbone,
build_resnet_fpn_p3p7_backbone) + modeling/poolers.py:12-46 (LevelMapper).
All are **unused by every shipped WSOD config** (SURVEY §2.1) — ported
for framework completeness, TPU-first:
- functional flax modules over the NHWC multi-stage tuple from
  ResNetBackbone(return_stages=True);
- nearest 2x top-down upsample (the reference's F.interpolate
  scale_factor=2 mode='nearest') via jnp.repeat — shape-static, fuses;
- LevelMapper becomes `assign_levels` + `multilevel_roi_pool`: instead of
  the reference's gather/scatter over dynamic per-level index tensors,
  every level pools ALL padded rois and a one-hot level mask selects the
  winner — 4 static pooler calls, no dynamic shapes, vectorizes on TPU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_uniform_(a=1): gain^2 = 2/(1+1^2) = 1
_KAIMING_U1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FPN(nn.Module):
    """Lateral 1x1 + top-down nearest-2x + posthoc 3x3 per level
    (fpn.py:7-76). Input: feature tuple lowest-stride first. in_channels
    of 0 skips that level's lateral (the RetinaNet P3-P7 variant).

    top_block: None | "maxpool" (LastLevelMaxPool: stride-2 1x1 maxpool on
    P5) | "p6p7" (LastLevelP6P7: two stride-2 3x3 convs for RetinaNet).
    p6p7_on_c5: feed C5 (not P5) to p6 when in!=out channels (fpn.py:96).
    """

    in_channels_list: Sequence[int]
    out_channels: int = 256
    top_block: Optional[str] = "maxpool"
    p6p7_on_c5: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Tuple[jnp.ndarray, ...]):
        assert len(features) == len(self.in_channels_list)
        feats = [f.astype(self.compute_dtype) for f in features]

        def conv(x, k, name):
            p = (k - 1) // 2
            return nn.Conv(self.out_channels, (k, k),
                           padding=[(p, p), (p, p)],
                           dtype=self.compute_dtype,
                           param_dtype=jnp.float32,
                           kernel_init=_KAIMING_U1, name=name)(x)

        n = len(feats)
        last_inner = conv(feats[-1], 1, f"fpn_inner{n}")
        results = [conv(last_inner, 3, f"fpn_layer{n}")]
        for idx in range(n - 2, -1, -1):
            if self.in_channels_list[idx] == 0:
                continue
            inner_lateral = conv(feats[idx], 1, f"fpn_inner{idx + 1}")
            top_down = _upsample2x_nearest(last_inner)
            # guard odd spatial dims (reference assumes exact 2x)
            top_down = top_down[:, :inner_lateral.shape[1],
                                :inner_lateral.shape[2], :]
            last_inner = inner_lateral + top_down
            results.insert(0, conv(last_inner, 3, f"fpn_layer{idx + 1}"))

        if self.top_block == "maxpool":
            results.append(nn.max_pool(results[-1], (1, 1), strides=(2, 2)))
        elif self.top_block == "p6p7":
            src = feats[-1] if self.p6p7_on_c5 else results[-1]
            p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], dtype=self.compute_dtype,
                         param_dtype=jnp.float32, kernel_init=_KAIMING_U1,
                         name="p6")(src)
            p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)], dtype=self.compute_dtype,
                         param_dtype=jnp.float32, kernel_init=_KAIMING_U1,
                         name="p7")(nn.relu(p6))
            results.extend([p6, p7])
        return tuple(results)


class ResNetFPNBackbone(nn.Module):
    """build_resnet_fpn_backbone (backbone.py:30-52): R-50/101 C2..C5 ->
    P2..P5 + LastLevelMaxPool P6. out_channels = 256."""

    depth: str = "R-50"
    out_channels: int = 256
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from .resnet import ResNetBackbone

        body = ResNetBackbone(depth=self.depth, stages_out=5,
                              c5_stride_one=False,   # real stride-32 C5
                              compute_dtype=self.compute_dtype,
                              return_stages=True, name="body")
        stages = body(x)
        basic = self.depth == "R-18"
        chans = ([64, 128, 256, 512] if basic
                 else [256, 512, 1024, 2048])
        return FPN(chans, self.out_channels, top_block="maxpool",
                   compute_dtype=self.compute_dtype, name="fpn")(stages)


class ResNetFPNP3P7Backbone(nn.Module):
    """build_resnet_fpn_p3p7_backbone (backbone.py:54-78): the RetinaNet
    pyramid P3..P7 (C2 lateral skipped, LastLevelP6P7 on C5)."""

    depth: str = "R-50"
    out_channels: int = 256
    use_c5: bool = True            # cfg.MODEL.RETINANET.USE_C5
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from .resnet import ResNetBackbone

        body = ResNetBackbone(depth=self.depth, stages_out=5,
                              c5_stride_one=False,
                              compute_dtype=self.compute_dtype,
                              return_stages=True, name="body")
        stages = body(x)
        basic = self.depth == "R-18"
        chans = [0] + ([128, 256, 512] if basic else [512, 1024, 2048])
        return FPN(chans, self.out_channels, top_block="p6p7",
                   p6p7_on_c5=self.use_c5,
                   compute_dtype=self.compute_dtype, name="fpn")(stages)


# ---------------------------------------------------------------------------
# multi-level RoI assignment (poolers.py LevelMapper)
# ---------------------------------------------------------------------------

def assign_levels(boxes: jnp.ndarray, k_min: int, k_max: int,
                  canonical_scale: int = 224,
                  canonical_level: int = 4) -> jnp.ndarray:
    """FPN paper eqn. 1 (poolers.py:31-45): per-roi pyramid level from
    sqrt(area). boxes [..., 4] xyxy (+1 area convention like the
    reference's boxlist area) -> int32 levels in [k_min, k_max]."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + 1, 0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + 1, 0)
    s = jnp.sqrt(w * h)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


def multilevel_roi_pool(pool_fn, features: Sequence[jnp.ndarray],
                        scales: Sequence[float], boxes: jnp.ndarray,
                        box_mask: jnp.ndarray,
                        canonical_scale: int = 224) -> jnp.ndarray:
    """Pooler over an FPN pyramid (poolers.py:85-140 Pooler.forward with
    a LevelMapper). pool_fn(feat, boxes, mask, scale) -> [B, P, r, r, C].

    TPU-first: every level pools ALL rois (static shapes) and a one-hot
    level select keeps the assigned level's result — 4 masked pooler
    calls instead of the reference's dynamic index gather/scatter.
    """
    import math
    k_min = int(round(-math.log2(scales[0])))
    k_max = int(round(-math.log2(scales[-1])))
    levels = assign_levels(boxes, k_min, k_max, canonical_scale)
    out = None
    for li, (feat, scale) in enumerate(zip(features, scales)):
        sel = (levels == (k_min + li)) & box_mask
        pooled = pool_fn(feat, boxes, sel, scale)
        contrib = jnp.where(sel[..., None, None, None], pooled, 0)
        out = contrib if out is None else out + contrib
    return out
