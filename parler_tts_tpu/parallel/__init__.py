from .mesh import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    params_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_partition_spec",
    "params_shardings",
    "replicated",
    "shard_params",
]
