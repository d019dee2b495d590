from .mesh import make_mesh, batch_sharding, replicated, shard_batch, replicate
from .tp import tp_neck_param_shardings, shard_neck_params, tp_neck_apply
from .sp import make_sp_mesh, sp_backbone_apply

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate", "tp_neck_param_shardings", "shard_neck_params",
           "tp_neck_apply", "make_sp_mesh", "sp_backbone_apply"]
