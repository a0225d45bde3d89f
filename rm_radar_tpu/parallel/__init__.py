from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
