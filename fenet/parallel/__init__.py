from fenet.parallel.distributed import (
    ProcessShardDataset,
    initialize,
    is_primary,
    local_batch_size,
)
from fenet.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_map_batch,
)

__all__ = [
    "ProcessShardDataset",
    "batch_sharding",
    "initialize",
    "is_primary",
    "local_batch_size",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_map_batch",
]
