from .mesh import (
    make_mesh,
    auto_mesh_shape,
    initialize_multihost,
    make_global_mesh,
)
from .sharding import (
    batch_sharding,
    replicate,
    shard_batch,
    make_sharded_infer,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "auto_mesh_shape",
    "initialize_multihost",
    "make_global_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "make_sharded_infer",
    "make_sharded_train_step",
]
