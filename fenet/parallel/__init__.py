from fenet.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_map_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_map_batch",
]
