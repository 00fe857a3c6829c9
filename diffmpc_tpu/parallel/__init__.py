from .mesh import (
    BATCH_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .training import (
    StepStats,
    TrainState,
    generate_expert_data,
    imitation_loss,
    init_train_state,
    make_dp_train_step,
)

__all__ = [
    "BATCH_AXIS",
    "StepStats",
    "TrainState",
    "batch_sharding",
    "generate_expert_data",
    "imitation_loss",
    "init_train_state",
    "make_dp_train_step",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
