"""ResNet backbones with frozen batch norm (R-18/50/101-C4/C5).

Reference: wetectron/modeling/backbone/resnet.py (maskrcnn-benchmark ResNet,
FrozenBatchNorm2d from layers/batch_norm.py) + the stride hack in
generalized_rcnn.py:36-45: for the WSOD R-*-C5 configs, layer4's first block
runs at stride 1, so C5 output stride is 16 (``POOLER_SCALES (0.0625,)``).

The RoI neck for these configs is NOT a conv head: the reference's
ResNet50Conv5ROIFeatureExtractor (roi_box_feature_extractors.py:13-110) is
pooler + Linear(7*7*2048, 2048) -> ReLU -> Dropout -> Linear(2048, 4096)
(the conv5 head is commented out upstream); see ResNetRoINeck below.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# (block counts per stage) for each depth
RESNET_STAGES = {
    "R-18": (2, 2, 2, 2),
    "R-50": (3, 4, 6, 3),
    "R-101": (3, 4, 23, 3),
}


class FrozenBatchNorm(nn.Module):
    """BN with all statistics and affine params frozen (layers/batch_norm.py).

    Parameters are stored (so checkpoints import) but marked frozen by the
    optimizer labels; they never update from batch statistics.
    """

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        w = (scale / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        return x * w + b


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    stride_in_1x1: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        identity = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.compute_dtype,
                               param_dtype=jnp.float32,
                               kernel_init=_KAIMING_OUT, name="downsample")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        out = nn.Conv(self.bottleneck_channels, (1, 1), strides=(s1, s1),
                      use_bias=False, dtype=self.compute_dtype,
                      param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="bn1")(out))
        out = nn.Conv(self.bottleneck_channels, (3, 3), strides=(s3, s3),
                      padding=[(self.dilation, self.dilation)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.compute_dtype,
                      param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                      name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(name="bn2")(out))
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.compute_dtype, param_dtype=jnp.float32,
                      kernel_init=_KAIMING_OUT, name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.compute_dtype,
                               param_dtype=jnp.float32,
                               kernel_init=_KAIMING_OUT, name="downsample")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        out = nn.Conv(self.out_channels, (3, 3),
                      strides=(self.stride, self.stride), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.compute_dtype,
                      param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="bn1")(out))
        out = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.compute_dtype,
                      param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                      name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """R-{18,50,101}-C{4,5}. C5 variants run layer4 at stride 1 (the
    reference's WSOD hack) so output stride stays 16."""

    depth: str = "R-50"            # R-18 | R-50 | R-101
    stages_out: int = 5            # 4 -> C4 (1024ch), 5 -> C5
    c5_stride_one: bool = True     # generalized_rcnn.py:36-45
    compute_dtype: jnp.dtype = jnp.bfloat16
    # FPN mode (models/fpn.py): return every stage's output (C2..C{n})
    # instead of only the last — the reference's ResNet(return_features)
    # flag (backbone/resnet.py:103-160)
    return_stages: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.compute_dtype,
                    param_dtype=jnp.float32, kernel_init=_KAIMING_OUT,
                    name="stem_conv")(x)
        x = nn.relu(FrozenBatchNorm(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        blocks = RESNET_STAGES[self.depth]
        basic = self.depth == "R-18"
        channels = [64, 128, 256, 512] if basic else [256, 512, 1024, 2048]
        bott = [64, 128, 256, 512]
        n_stages = self.stages_out - 1  # stages 1..4 => layers 1..4
        stage_outs = []
        for stage in range(n_stages):
            stride = 1 if stage == 0 else 2
            if stage == 3 and self.stages_out == 5 and self.c5_stride_one:
                stride = 1
            for b in range(blocks[stage]):
                s = stride if b == 0 else 1
                if basic:
                    x = BasicBlock(channels[stage], s, self.compute_dtype,
                                   name=f"layer{stage+1}_{b}")(x)
                else:
                    x = Bottleneck(channels[stage], bott[stage], s,
                                   stride_in_1x1=True,
                                   compute_dtype=self.compute_dtype,
                                   name=f"layer{stage+1}_{b}")(x)
            stage_outs.append(x)
        return tuple(stage_outs) if self.return_stages else x

    @property
    def out_channels(self):
        basic = self.depth == "R-18"
        if self.stages_out == 5:
            return 512 if basic else 2048
        return 256 if basic else 1024


class ResNetRoINeck(nn.Module):
    """ResNet50Conv5ROIFeatureExtractor's classifier: 7*7*2048 -> 2048 ->
    4096 with ReLU+Dropout pairs (roi_box_feature_extractors.py:55-63).
    Param names fc6/fc7 for checkpoint-importer symmetry."""

    mid_dim: int = 2048
    out_dim: int = 4096
    dropout_rate: float = 0.5
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 row_ids: jnp.ndarray | None = None,
                 row_key: jnp.ndarray | None = None) -> jnp.ndarray:
        # (row_ids, row_key): per-row-seeded dropout, same contract as
        # VGGRoINeck (the detector's gradient-free clean pass + bank-row
        # recompute)
        import jax as _jax
        x = x.reshape(x.shape[0], -1).astype(self.compute_dtype)
        for li, (dim, name) in enumerate(((self.mid_dim, "fc6"),
                                          (self.out_dim, "fc7"))):
            x = nn.Dense(dim, dtype=self.compute_dtype,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.01),
                         name=name)(x)
            x = nn.relu(x)
            if row_ids is None:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=not train)(x)
            elif train and self.dropout_rate > 0.0:
                key = _jax.random.fold_in(row_key, li)
                keep = _jax.vmap(
                    lambda r: _jax.random.bernoulli(
                        _jax.random.fold_in(key, r),
                        1.0 - self.dropout_rate, (dim,)))(row_ids)
                x = jnp.where(keep, x / (1.0 - self.dropout_rate),
                              0.0).astype(self.compute_dtype)
        return x
