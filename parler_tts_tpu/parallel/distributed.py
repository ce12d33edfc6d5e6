"""Multi-host (multi-process) JAX wiring.

The reference trains on 4 nodes x 8 H100 via `accelerate launch` + torch DDP
over NCCL (`/root/reference/training/run_parler_tts_training.py:112-120`,
`training/README.md:196`). The TPU-native equivalent (SURVEY.md §2.4) is
single-controller multi-process JAX: each host calls
`jax.distributed.initialize`, the mesh spans all hosts' devices (ICI within a
slice, DCN across), and each host feeds only its local shard of the global
batch — `jax.make_array_from_process_local_data` assembles the global array,
and the psum-based loss normalization in the train step is then exact across
hosts with no further code.

Environment contract (mirrors `accelerate launch`'s rank env vars):
  JAX_COORDINATOR  host:port of process 0 (presence turns multi-process on)
  JAX_NUM_PROCESSES  total process count
  JAX_PROCESS_ID     this process's rank
"""

from __future__ import annotations

import os
from typing import Any, Tuple

_INITIALIZED = False


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize multi-process JAX if a coordinator is configured via env.

    Must run before any JAX backend use on the worker. Returns
    (process_index, process_count) either way.
    """
    global _INITIALIZED
    import jax

    coord = os.environ.get("JAX_COORDINATOR")
    if coord and not _INITIALIZED:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch_size: int) -> slice:
    """Rows of the global batch this process must supply.

    The data iterator materializes the same deterministic global order on every
    host (same seed), then each host keeps only its slice — the JAX analogue of
    Accelerate's per-process dataloader sharding (reference :496, :1006)."""
    import jax

    pc, pi = jax.process_count(), jax.process_index()
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {pc} processes"
        )
    local = global_batch_size // pc
    return slice(pi * local, (pi + 1) * local)


def host_local_to_global(batch: Any, mesh) -> Any:
    """Assemble per-host local batch shards into global jax.Arrays sharded over
    the mesh's 'data' axis. No-op cost on a single process."""
    import jax

    from .mesh import batch_sharding

    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
