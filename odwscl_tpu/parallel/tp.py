"""Tensor-parallel fc6/fc7 serving (Megatron-style 2-GEMM MLP sharding).

The reference's only parallelism is DDP data parallelism
(tools/train_net.py:50-55); this module is the TPU-native scaling option
the eval profile motivates: fc6/fc7 are ~40% of the serving forward
(RESULTS.md segment table) and their GEMMs shard cleanly —

  fc6 kernel [25088, 4096] column-sharded over the ``tp`` axis,
  fc7 kernel [4096, 4096]  row-sharded,

so the hidden activation [N, 4096/tp] never materializes globally, the
inter-GEMM ReLU is shard-local, and ONE psum after fc7 (riding ICI)
produces the replicated output. Weight memory and GEMM FLOPs per chip
both drop by the tp factor. Composes with data parallelism as a 2-D
(data, tp) mesh: rois shard over data, hidden over tp.

Eval/serving path only (training necks stay replicated-DP — VGG16's 138M
params fit per chip; the win here is serving latency at large P).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_neck_param_shardings(mesh: Mesh) -> dict:
    """NamedShardings for the VGGRoINeck param tree ({fc6,fc7}/{kernel,
    bias}): fc6 column-sharded, fc7 row-sharded, fc7 bias replicated."""
    return {
        "fc6": {"kernel": NamedSharding(mesh, P(None, "tp")),
                "bias": NamedSharding(mesh, P("tp"))},
        "fc7": {"kernel": NamedSharding(mesh, P("tp", None)),
                "bias": NamedSharding(mesh, P())},
    }


def shard_neck_params(mesh: Mesh, neck_params: dict) -> dict:
    sh = tp_neck_param_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, neck_params, sh)


def tp_neck_apply(mesh: Mesh, neck_params: dict, x: jnp.ndarray,
                  compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Eval-mode fc6/fc7 (VGGRoINeck semantics, no dropout) under (data,
    tp) sharding. x: [N, 7, 7, 512] or [N, 25088], sharded over ``data``
    (or replicated). Returns the replicated-over-tp [N, 4096] output —
    numerically the single-device neck up to the psum reduction order."""
    x = x.reshape(x.shape[0], -1)

    def f(k6, b6, k7, b7, xs):
        xs = xs.astype(compute_dtype)
        h = jnp.maximum(xs @ k6.astype(compute_dtype)
                        + b6.astype(compute_dtype), 0)
        z = h @ k7.astype(compute_dtype)
        z = jax.lax.psum(z.astype(jnp.float32), "tp")
        return jnp.maximum(z + b7.astype(jnp.float32),
                           0).astype(compute_dtype)

    fn = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P("tp", None), P(), P("data")),
        out_specs=P("data"))
    return fn(neck_params["fc6"]["kernel"], neck_params["fc6"]["bias"],
              neck_params["fc7"]["kernel"], neck_params["fc7"]["bias"], x)
