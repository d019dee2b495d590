"""VGG16-OICR backbone and fc6/fc7 RoI neck.

Reference: wetectron/modeling/backbone/vgg16.py. The OICR variant removes
pool4 (identity) and dilates the conv5 block by 2 (vgg16.py:66-74, 90), so
the output stride is 8 (``POOLER_SCALES (0.125,)``) with 512 channels. The
RoI neck is the VGG classifier head: 512*7*7 -> 4096 -> 4096 with ReLU +
dropout (vgg16.py:122-130).

TPU-first notes: NHWC layout (XLA's preferred conv layout on TPU), bf16
compute with f32 params via an explicit dtype cast, and the frozen conv
blocks (FREEZE_CONV_BODY_AT=2, vgg16.py:48-55) handled by an optimizer mask
rather than requires_grad.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Layer spec: int = 3x3 conv channels, 'M' = 2x2 maxpool, 'I' = identity
# (removed pool), '<n>-D' = dilated 3x3 conv (vgg16.py:86-93).
VGG_CFGS = {
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512],
    "VGG16-OICR": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512,
                   512, "I", "512-D", "512-D", "512-D"],
    "VGG16-ENCODER": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512,
                      512, 512, "512-D", "512-D", "512-D"],
}

# Conv indices delimiting freeze blocks, matching the reference's
# nn.Sequential layer indices [5, 10, 17, 23, 29] (vgg16.py:53): freezing at
# block k freezes the first FREEZE_CONV_COUNTS[k-1] convolutions.
FREEZE_CONV_COUNTS = [2, 4, 7, 10, 13]

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _ShiftedInputConv(nn.Module):
    """3x3 stride-1 conv computed as shifted-stack + matmul.

    XLA's TPU conv path wastes the MXU when C_in is tiny (the RGB stem conv
    ran at ~2 TF/s, ~15 ms of the backbone); stacking the 9 shifted views
    into [B,H,W,9*C_in] turns it into one K=27 GEMM. Parameter names and
    shapes match nn.Conv exactly, so weight importers are unaffected."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", _KAIMING_OUT, (3, 3, cin, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        h, w = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # (dy, dx, cin) stacking order == row-major kernel flatten order
        stacked = jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
             for dx in range(3)], axis=-1)
        kmat = kernel.reshape(9 * cin, self.features).astype(self.compute_dtype)
        return (stacked.astype(self.compute_dtype) @ kmat
                + bias.astype(self.compute_dtype))


class _ConvKB(nn.Module):
    """nn.Conv-shaped (kernel, bias) params without applying them — the
    int8 eval conv path consumes them directly. Param tree matches nn.Conv
    ({name}/{kernel,bias}), so checkpoints/importers are unaffected."""

    features: int
    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _KAIMING_OUT, self.kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class VGGBackbone(nn.Module):
    """Returns stride-8 (OICR variant) NHWC features [B, H/8, W/8, 512]."""

    arch: str = "VGG16-OICR"
    compute_dtype: jnp.dtype = jnp.bfloat16
    # RGB stem: nn.Conv beats the round-2 shifted-stack GEMM by ~19 ms at
    # the bench shape (the [B,H,W,27] stack is HBM-bound); measured
    # tools/bench_backbone.py r3: 78.3 vs 59.0 ms/batch
    stem_gemm: bool = False
    # int8 dynamic-quantized convs on the eval path (TPU.INT8_EVAL_CONVS):
    # per-Cout weight scales + per-tensor activation scale, int32 MXU
    # accumulation at 2x the bf16 rate (ops/quant.py conv2d_int8). Applied
    # from conv2_1 on (the RGB stem stays bf16 — C_in=3 is layout-bound,
    # not MXU-bound). Eval-only: train always runs bf16.
    int8_eval: bool = False
    # Static-calibrated activation scales for the int8 eval convs: a
    # calibration pass (calibrate=True, mutable=["quant"]) records per-layer
    # input abs-maxes into the "quant" collection; with int8_static=True the
    # int8 convs then read those scalars instead of recomputing abs-max per
    # batch — the dynamic abs-max is a full extra HBM pass over each
    # activation AND a fusion barrier (the quantize cannot fuse into the
    # producing conv's epilogue while its scale depends on all of x).
    # Standard post-training-quantization serving practice; drift is
    # bounded by tests/test_int8_eval.py.
    int8_static: bool = False
    # conv indices kept bf16 inside the int8 serving stack (selective
    # fallback for drift-sensitive layers; TPU.INT8_BF16_LAYERS)
    int8_bf16_layers: tuple = ()
    # Prune the backward at the freeze boundary (first freeze_at convs are
    # frozen, vgg16.py:48-55). torch's requires_grad=False stops autograd
    # from ever reaching these first layers; without the stop_gradient XLA
    # computes their dgrads+wgrads (conv1_2 is the most expensive conv in
    # the net) only for the optimizer mask to zero the update. Forward
    # numerics are untouched.
    freeze_at: int = 0
    # Space-to-depth first block (TPU.S2D_STEM, ops/s2d_stem.py): computes
    # conv1_1 -> relu -> conv1_2 -> relu -> pool1 entirely at half
    # resolution. Pure re-association of the same bf16/f32 sums (NOT a
    # quantization/approximation — tests/test_s2d_stem.py), same param tree.
    # Motivation: conv1_1 runs at ~3.7 TF/s (C_in=3 wastes 97% of the MXU's
    # K lanes) and conv1_2's full-res activation is the largest tensor in
    # the net; measured round 4: stem 21.9 ms -> see RESULTS.md.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, fast_eval: bool = False,
                 calibrate: bool = False) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        conv_idx = 0
        spec = VGG_CFGS[self.arch]
        num_convs = sum(1 for v in spec if v not in ("M", "I"))
        if (self.s2d_stem and spec[:3] == [64, 64, "M"]
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            from odwscl_tpu.ops.s2d_stem import stem_s2d
            k1, b1 = _ConvKB(64, (3, 3, x.shape[-1], 64), name="conv0")()
            k2, b2 = _ConvKB(64, (3, 3, 64, 64), name="conv1")()
            x = stem_s2d(x, k1, b1, k2, b2, compute_dtype=self.compute_dtype)
            conv_idx = 2
            spec = spec[3:]
            # the direct path prunes at conv_idx==2 (pre-pool1); pruning
            # post-pool1 is equivalent (pool of a stopped value). freeze_at
            # == 1 falls mid-stem: skip the pruning, the optimizer mask
            # alone freezes conv0 (numerics are unaffected either way).
            if self.freeze_at == 2:
                x = jax.lax.stop_gradient(x)
        for si, v in enumerate(spec):
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif v == "I":
                pass
            else:
                if isinstance(v, str) and v.endswith("-D"):
                    ch, dilation, pad = int(v.split("-")[0]), 2, 2
                else:
                    ch, dilation, pad = int(v), 1, 1
                if fast_eval and self.int8_eval and conv_idx >= 2:
                    from odwscl_tpu.ops.quant import conv2d_int8, conv2d_ref
                    k, b = _ConvKB(ch, (3, 3, x.shape[-1], ch),
                                   name=f"conv{conv_idx}")()
                    if conv_idx in self.int8_bf16_layers:
                        # selective bf16 fallback (TPU.INT8_BF16_LAYERS):
                        # keep the most drift-sensitive layers
                        # (tests/test_int8_eval.py ranks them) at full
                        # precision inside the int8 serving stack
                        x = conv2d_ref(x, k, b, dilation=dilation,
                                       padding=pad,
                                       out_dtype=self.compute_dtype)
                        conv_idx += 1
                        if conv_idx < num_convs:
                            x = nn.relu(x)
                        if conv_idx == self.freeze_at:
                            import jax
                            x = jax.lax.stop_gradient(x)
                        continue  # tail already applied for this conv
                    qs = None
                    cin = x.shape[-1]
                    if calibrate or self.int8_static:
                        # per-INPUT-CHANNEL activation abs-maxes (round 5;
                        # ops/quant.py folds them into the kernel exactly).
                        # Scalar values from a pre-round-5 int8_scales.npz
                        # still load: conv2d_int8 dispatches on ndim.
                        qs = self.variable(
                            "quant", f"conv{conv_idx}_act",
                            lambda: jnp.zeros((cin,), jnp.float32))
                    if calibrate:
                        qs.value = jnp.maximum(
                            qs.value,
                            jnp.max(jnp.abs(x.astype(jnp.float32)),
                                    axis=(0, 1, 2)))
                        x = conv2d_ref(x, k, b, dilation=dilation,
                                       padding=pad,
                                       out_dtype=self.compute_dtype)
                    else:
                        x = conv2d_int8(
                            x, k, b, dilation=dilation, padding=pad,
                            out_dtype=self.compute_dtype,
                            act_scale=qs.value if self.int8_static else None)
                elif conv_idx == 0 and self.stem_gemm:
                    # RGB stem: shifted-stack GEMM (same params as nn.Conv)
                    x = _ShiftedInputConv(ch, self.compute_dtype,
                                          name=f"conv{conv_idx}")(x)
                else:
                    x = nn.Conv(ch, (3, 3), padding=[(pad, pad), (pad, pad)],
                                kernel_dilation=(dilation, dilation),
                                dtype=self.compute_dtype,
                                param_dtype=jnp.float32,
                                kernel_init=_KAIMING_OUT,
                                name=f"conv{conv_idx}")(x)
                conv_idx += 1
                # the reference strips the final ReLU (vgg16.py:83)
                if conv_idx < num_convs:
                    x = nn.relu(x)
                if conv_idx == self.freeze_at:
                    import jax
                    x = jax.lax.stop_gradient(x)
        return x


class _DenseKB(nn.Module):
    """Dense-shaped (kernel, bias) params without applying them — the neck
    picks the bf16 or int8 matmul path at call time. The param tree
    ({name}/{kernel,bias}) matches nn.Dense, so checkpoints and the torch
    weight importer are unaffected."""

    features: int

    @nn.compact
    def __call__(self, din: int):
        k = self.param("kernel", nn.initializers.normal(0.01),
                       (din, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class VGGRoINeck(nn.Module):
    """fc6/fc7 classifier head over flattened pooled RoI features.

    Input [N, 7, 7, 512] (or pre-flattened [N, 7*7*512]); output [N, 4096].
    Flattening is (h, w, c) row-major — the torch checkpoint importer
    permutes fc6 weights from the reference's (c, h, w) order.

    int8_eval: quantized serving path (ops/quant.py) for the eval-mode
    matmuls — int8 MXU at 2x the bf16 rate; training always runs bf16.

    (row_ids, row_key): per-row-SEEDED dropout (mask for row i derived
    from fold_in(fold_in(row_key, layer), row_ids[i])), which makes the
    mask a pure function of (key, row identity) instead of the row's
    position in the batch. The detector's contra train path derives
    row_key ONCE and uses it to run the all-roi clean pass gradient-free,
    then recompute ONLY the mined bank rows differentiably with
    bit-identical dropout masks (detector.py train_forward) — the
    full-size fc6/fc7 backward disappears.
    """

    hidden_dim: int = 4096
    dropout_rate: float = 0.5
    compute_dtype: jnp.dtype = jnp.bfloat16
    int8_eval: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 row_ids: jnp.ndarray | None = None,
                 row_key: jnp.ndarray | None = None) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1).astype(self.compute_dtype)
        for li, name in enumerate(("fc6", "fc7")):
            k, b = _DenseKB(self.hidden_dim, name=name)(x.shape[-1])
            if self.int8_eval and not train:
                from odwscl_tpu.ops.quant import dense_int8
                x = dense_int8(x, k, b, self.compute_dtype)
            else:
                x = (x @ k.astype(self.compute_dtype)
                     + b.astype(self.compute_dtype))
            x = nn.relu(x)
            if row_ids is None:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=not train)(x)
            elif train and self.dropout_rate > 0.0:
                key = jax.random.fold_in(row_key, li)
                keep = jax.vmap(
                    lambda r: jax.random.bernoulli(
                        jax.random.fold_in(key, r),
                        1.0 - self.dropout_rate,
                        (self.hidden_dim,)))(row_ids)
                x = jnp.where(keep, x / (1.0 - self.dropout_rate),
                              0.0).astype(self.compute_dtype)
        return x
