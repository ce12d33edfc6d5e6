from .train_state import (
    Batch,
    TrainState,
    make_optimizer,
    make_train_step,
    shard_train_state,
    state_shardings,
)

__all__ = [
    "Batch",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "shard_train_state",
    "state_shardings",
]
