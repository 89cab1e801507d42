from .checkpoint import CheckpointManager
from .state import (
    TrainState,
    make_adam,
    make_fused_adam,
    make_denoise_train_step,
    make_partitioned_sparse_train_step,
    make_ring_denoise_train_step,
    make_sharded_denoise_train_step,
    masked_mse,
)

__all__ = [
    "CheckpointManager",
    "TrainState",
    "make_adam",
    "make_fused_adam",
    "make_denoise_train_step",
    "make_partitioned_sparse_train_step",
    "make_ring_denoise_train_step",
    "make_sharded_denoise_train_step",
    "masked_mse",
]
