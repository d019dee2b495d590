"""FBNet mobile backbone family: arch-def interpreter + IRF blocks.

Parity target: wetectron/modeling/backbone/fbnet.py (252) +
fbnet_builder.py (829) + fbnet_modeldef.py (218) — the NAS-searched
mobile architectures maskrcnn-benchmark carried; **unused by every
shipped WSOD config** (SURVEY §2.1) — ported for framework completeness.

What is ported, behavior-for-behavior:
- the arch-def schema {"block_op_type": [[op,..],..], "block_cfg":
  {"first": [c, s], "stages": [[[t, c, n, s], ...], ...], "backbone":
  [stage indices], <head names>: [...]}} and its expansion
  (fbnet_builder.py:563-668 `unify_arch_def`: every [t,c,n,s] unrolls to
  n blocks, stride s on the first only);
- the primitive set the shipped modeldefs actually use: `skip`
  (Identity), `ir_k{1,3,5,7}[_e{1,3,6}][_s4]` (IRFBlock: grouped pw
  expand -> optional mid channel-shuffle -> depthwise kxk -> pw-linear,
  residual when stride 1 and C_in == C_out, optional SE), negative
  strides = nearest upsample (fbnet_builder.py:428-442);
- width scaling: mid = divisible(C_in * t, width_divisor) with the
  builder's py2 rounding; per-builder scale_factor on every block's
  output channels (FBNetBuilder.add_blocks);
- FBNetTrunk (backbone stages -> single C_last feature) and the
  stage-extraction helpers heads use (`get_blocks`).

TPU-first notes: NHWC flax modules; depthwise conv =
feature_group_count; BN is this framework's FrozenBatchNorm (the
reference trains FBNet with live "bn" — this port exposes the same
topology/params minus running-stat updates, like every other backbone
here; resnet.py FrozenBatchNorm). Arch tables are DATA: "default" (the
MobileNetV2 table, Sandler et al. 2018) ships as the example; any
reference modeldef entry loads verbatim via `arch_def=` / JSON
(cfg.MODEL.FBNET.ARCH_DEF) since the schema is identical.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet import FrozenBatchNorm

_KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out",
                                                "truncated_normal")

# the "default" arch: MobileNetV2's inverted-residual table (public:
# Sandler et al., arXiv:1801.04381 Table 2), backbone stages only
MODEL_ARCH: Dict[str, Any] = {
    "default": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k3"] * 2,
            ["ir_k3"] * 3,
            ["ir_k3"] * 7,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
            ],
            "backbone": [0, 1, 2, 3],
        },
    },
}


def _py2_round(x: float) -> int:
    return int(round(x + 1e-9)) if x >= 0 else -int(round(-x + 1e-9))


def _divisible(num: float, divisor: int, min_val: int) -> int:
    if divisor <= 1:
        return _py2_round(num)
    ret = max(min_val, int(num + divisor / 2) // divisor * divisor)
    return ret


def unify_arch_def(arch_def: Dict[str, Any]) -> Dict[str, Any]:
    """Expand [t, c, n, s] stage configs into per-block dicts
    (fbnet_builder.py:641-668)."""
    ret = copy.deepcopy(arch_def)
    cfg = ret.pop("block_cfg")
    ops = ret.pop("block_op_type")
    ret.update({k: v for k, v in cfg.items() if k != "stages"})
    blocks: List[Dict[str, Any]] = []
    for stage_idx, (stage, stage_ops) in enumerate(zip(cfg["stages"], ops)):
        expanded = []
        for t, c, n, s in stage:
            for i in range(n):
                expanded.append([t, c, 1, s if i == 0 else 1])
        assert len(expanded) == len(stage_ops), (
            f"stage {stage_idx}: {len(expanded)} blocks vs "
            f"{len(stage_ops)} op types")
        for block_idx, (b, op) in enumerate(zip(expanded, stage_ops)):
            blocks.append({"stage_idx": stage_idx, "block_idx": block_idx,
                           "block": b, "block_op_type": op})
    ret["stages"] = blocks
    return ret


def get_blocks(arch_def: Dict[str, Any],
               stage_indices: Optional[Sequence[int]] = None,
               block_indices: Optional[Sequence[int]] = None):
    ret = copy.deepcopy(arch_def)
    ret["stages"] = [
        b for b in arch_def["stages"]
        if (not stage_indices or b["stage_idx"] in stage_indices)
        and (not block_indices or b["block_idx"] in block_indices)]
    return ret


def _parse_op(op: str) -> Dict[str, Any]:
    """ir_k5_e3 -> kernel 5, expansion 3; _s4 -> mid shuffle, pw_group 4;
    'skip' -> identity (fbnet_builder.py:37-140 PRIMITIVES)."""
    if op == "skip":
        return {"kind": "skip"}
    assert op.startswith("ir_k") or op == "shuffle", f"unknown op {op!r}"
    if op == "shuffle":
        return {"kind": "ir", "kernel": 3, "expansion": None,
                "shuffle": True, "pw_group": 4, "se": False}
    parts = op.split("_")
    kernel = int(parts[1][1:])
    spec = {"kind": "ir", "kernel": kernel, "expansion": None,
            "shuffle": False, "pw_group": 1, "se": False}
    for p in parts[2:]:
        if p.startswith("e"):
            spec["expansion"] = float(p[1:])
        elif p == "s4":
            spec["shuffle"] = True
            spec["pw_group"] = 4
        elif p == "se":
            spec["se"] = True
    return spec


class _ConvBN(nn.Module):
    """ConvBNRelu (fbnet_builder.py:342-394): conv (no bias) + frozen BN
    (+ ReLU)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    use_bn: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.compute_dtype, param_dtype=jnp.float32,
                    kernel_init=_KAIMING_OUT, name="conv")(x)
        if self.use_bn:
            x = FrozenBatchNorm(name="bn")(x)
        return nn.relu(x) if self.relu else x


class _SE(nn.Module):
    """SEModule (fbnet_builder.py:397-411): squeeze-excite, mid = max(C/4, 8)."""

    channels: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid = max(self.channels // 4, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.compute_dtype,
                            param_dtype=jnp.float32, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(self.channels, (1, 1),
                               dtype=self.compute_dtype,
                               param_dtype=jnp.float32, name="fc2")(s))
        return x * s


def _channel_shuffle(x, groups: int):
    n, h, w, c = x.shape
    return x.reshape(n, h, w, groups, c // groups).swapaxes(
        3, 4).reshape(n, h, w, c)


class IRFBlock(nn.Module):
    """Inverted-residual (fbnet_builder.py:445-560)."""

    out_depth: int
    expansion: float
    stride: int
    kernel: int = 3
    width_divisor: int = 1
    shuffle: bool = False
    pw_group: int = 1
    se: bool = False
    dw_skip_bn: bool = False
    dw_skip_relu: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        res = self.stride == 1 and cin == self.out_depth
        mid = _divisible(int(cin * self.expansion), self.width_divisor,
                         self.width_divisor)
        y = _ConvBN(mid, 1, 1, self.pw_group,
                    compute_dtype=self.compute_dtype, name="pw")(x)
        if self.shuffle:
            y = _channel_shuffle(y, self.pw_group)
        stride = self.stride
        if stride < 0:               # negative stride = nearest upsample
            y = jnp.repeat(jnp.repeat(y, -stride, axis=1), -stride, axis=2)
            stride = 1
        if self.kernel > 1:
            y = _ConvBN(mid, self.kernel, stride, mid,
                        relu=not self.dw_skip_relu,
                        use_bn=not self.dw_skip_bn,
                        compute_dtype=self.compute_dtype, name="dw")(y)
        y = _ConvBN(self.out_depth, 1, 1, self.pw_group, relu=False,
                    compute_dtype=self.compute_dtype, name="pwl")(y)
        if res:
            y = y + x
        if self.se:
            y = _SE(self.out_depth, self.compute_dtype, name="se")(y)
        return y


class FBNetBlocks(nn.Module):
    """A sequence of unified block dicts (FBNetBuilder.add_blocks):
    out channels scale by scale_factor through _divisible."""

    blocks: tuple                   # of (op_str, [t, c, 1, s]) pairs
    scale_factor: float = 1.0
    width_divisor: int = 1
    dw_skip_bn: bool = False
    dw_skip_relu: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i, (op, (t, c, _n, s)) in enumerate(self.blocks):
            cout = _divisible(c * self.scale_factor, self.width_divisor, 8)
            spec = _parse_op(op)
            name = f"block{i}"
            if spec["kind"] == "skip":
                if x.shape[-1] != cout or s != 1:
                    x = _ConvBN(cout, 1, max(s, 1),
                                compute_dtype=self.compute_dtype,
                                name=name)(x)
            else:
                exp = spec["expansion"] if spec["expansion"] is not None \
                    else t
                x = IRFBlock(cout, exp, s, spec["kernel"],
                             self.width_divisor, spec["shuffle"],
                             spec["pw_group"], spec["se"],
                             self.dw_skip_bn, self.dw_skip_relu,
                             self.compute_dtype, name=name)(x)
        return x


def _blocks_of(arch: Dict[str, Any], stage_indices) -> tuple:
    sub = get_blocks(arch, stage_indices)
    return tuple((b["block_op_type"], tuple(b["block"]))
                 for b in sub["stages"])


class FBNetTrunk(nn.Module):
    """first conv + backbone stages -> single stride-compound feature
    (fbnet.py:79-105 FBNetTrunk + add_conv_body)."""

    arch: str = "default"
    arch_def: Optional[str] = None      # JSON overrides the named arch
    scale_factor: float = 1.0
    width_divisor: int = 1
    dw_skip_bn: bool = True             # cfg.MODEL.FBNET defaults
    dw_skip_relu: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        raw = (json.loads(self.arch_def) if self.arch_def
               else MODEL_ARCH[self.arch])
        arch = unify_arch_def(raw)
        first_c, first_s = arch["first"]
        cout = _divisible(first_c * self.scale_factor, self.width_divisor, 8)
        x = _ConvBN(cout, 3, first_s, compute_dtype=self.compute_dtype,
                    name="first")(x.astype(self.compute_dtype))
        n_stages = max(b["stage_idx"] for b in arch["stages"]) + 1
        trunk_stages = arch.get("backbone", list(range(n_stages - 1)))
        x = FBNetBlocks(_blocks_of(arch, trunk_stages), self.scale_factor,
                        self.width_divisor, self.dw_skip_bn,
                        self.dw_skip_relu, self.compute_dtype,
                        name="stages")(x)
        return x
