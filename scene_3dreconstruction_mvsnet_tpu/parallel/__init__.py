from .mesh import make_mesh, auto_mesh_shape
from .sharding import (
    batch_sharding,
    replicate,
    shard_batch,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "auto_mesh_shape",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "make_sharded_train_step",
]
