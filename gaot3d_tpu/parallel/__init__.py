from .mesh import make_mesh, batch_sharding, replicated
from .sharding import make_sharded_eval_step, make_sharded_train_step, shard_point_batch

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "shard_point_batch",
]
