"""Device mesh and sharding helpers.

Replaces the reference's DDP/NCCL data parallelism (tools/train_net.py:50-55,
utils/comm.py) with a jax.sharding mesh: parameters replicated, the batch
sharded over the ``data`` axis, gradients averaged by XLA-inserted
collectives riding ICI. The reference's only strategy is DP (SURVEY.md
section 2.3); a TP axis is reserved in the mesh API but sized 1 — VGG16's
138M params fit trivially per chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(axis_names) == 1:
        shape = (len(devices),)
    else:
        # data gets all devices; extra axes (tensor, ...) sized 1
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a Batch pytree with the leading axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
