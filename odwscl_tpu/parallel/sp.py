"""Spatially-partitioned backbone serving (sp axis: image height).

The reference's only parallelism is DDP data parallelism
(tools/train_net.py:50-55); the TPU-native scaling matrix this framework
ships is dp (training + eval batch), tp (fc6/fc7 neck, parallel/tp.py) and
this module's sp: the conv stack is ~50% of the serving forward
(RESULTS.md segment table) and is a stencil computation, so it shards over
the IMAGE HEIGHT dimension — each chip convolves a horizontal band, and
XLA's SPMD partitioner inserts the halo exchanges (collective-permutes of
the 1-row (3x3 conv) / 2-row (dilated conv5) borders) that make the result
bit-identical to the unsharded conv. This is the canonical TPU treatment
of large-image CNNs (GSPMD spatial partitioning) — NOT a translation of
anything in the reference, which has no sub-image parallelism at all.

When to use which axis (serving):
  - dp: throughput at batch >= chips — no communication at all.
  - sp: LATENCY at small batch, or images whose full-res activations
    (conv1_2 is H*W*64*2 bytes ~ 143 MB/img at 832x1344, far larger at
    satellite/medical resolutions) exceed a chip's HBM headroom. Halo
    traffic is rows-of-borders only and rides ICI.
  - tp: the fc6/fc7 GEMMs at large P (parallel/tp.py).
  sp composes with both on a (data, sp) / (data, sp, tp) mesh.

Why there is no pp/ep axis: VGG16's 13 heterogeneous conv layers give
pipeline stages unequal shapes and work (unlike a transformer's uniform
blocks), so an SPMD pipeline needs per-stage padded weights (wasted MXU
work) and still pays bubble overhead that dp/sp do not; expert parallelism
has no substrate (no MoE anywhere in the model family). Both are
deliberately out of scope rather than missing.

The stride-8 feature map is 64x smaller than the image, so the gather
back to replicated (or dp-sharded) layout before the RoI stage is cheap:
at 832x1344 it is 0.5% of the image bytes per image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_mesh(n_data: int, n_sp: int, devices=None) -> Mesh:
    """A 2-D (data, sp) mesh. sp is the minor (fastest-varying) axis so
    the per-conv halo exchanges ride adjacent-chip ICI links."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_sp, (
        f"need {n_data * n_sp} devices, have {len(devices)}")
    arr = np.asarray(devices[:n_data * n_sp]).reshape(n_data, n_sp)
    return Mesh(arr, ("data", "sp"))


def sp_backbone_apply(mesh: Mesh, params, images: jnp.ndarray, backbone,
                      *, gather: bool = True, **apply_kwargs):
    """Backbone forward with images sharded (batch over ``data``, height
    over ``sp``). Returns stride-8 features, gathered over sp (default;
    the RoI stage needs whole rois) and still batch-sharded over data.

    Correctness does not depend on H % (8 * sp): GSPMD pads uneven edge
    shards internally. Efficiency does — shards balance when
    H % (8 * sp) == 0, which the loader's IMAGE_PAD_MULTIPLE=32 guarantees
    for sp <= 4 (tests cover sp=4 on the 8-device CPU mesh).
    """
    in_spec = NamedSharding(mesh, P("data", "sp"))
    out_spec = NamedSharding(mesh, P("data") if gather
                             else P("data", "sp"))

    @partial(jax.jit, static_argnums=())
    def f(p, x):
        x = jax.lax.with_sharding_constraint(x, in_spec)
        feats = backbone.apply(p, x, **apply_kwargs)
        return jax.lax.with_sharding_constraint(feats, out_spec)

    return f(params, images)


def sp_backbone_lowered_text(mesh: Mesh, params, images, backbone,
                             **apply_kwargs) -> str:
    """Compiled-HLO text of the sp forward (test teeth: the halo exchange
    must be visible as collective-permute/all-gather ops, and the conv
    operands must be band-shaped — see tests/test_sp.py)."""
    in_spec = NamedSharding(mesh, P("data", "sp"))
    out_spec = NamedSharding(mesh, P("data"))

    def f(p, x):
        x = jax.lax.with_sharding_constraint(x, in_spec)
        feats = backbone.apply(p, x, **apply_kwargs)
        return jax.lax.with_sharding_constraint(feats, out_spec)

    return jax.jit(f).lower(params, images).compile().as_text()
