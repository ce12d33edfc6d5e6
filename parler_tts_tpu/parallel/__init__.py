from .distributed import (
    host_local_to_global,
    local_batch_slice,
    maybe_init_distributed,
)
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
    "host_local_to_global",
    "local_batch_slice",
    "make_mesh",
    "maybe_init_distributed",
    "param_partition_spec",
    "params_shardings",
    "replicated",
    "shard_params",
]
