from .mesh import make_mesh, batch_sharding, replicated, shard_batch, replicate
from .tp import tp_neck_param_shardings, shard_neck_params, tp_neck_apply

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate", "tp_neck_param_shardings", "shard_neck_params",
           "tp_neck_apply"]
