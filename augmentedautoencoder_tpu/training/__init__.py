"""Training subsystem: train state, jitted/sharded step, checkpointing."""

from .checkpoint import CheckpointManager
from .state import AAETrainState, create_train_state
from .trainer import Trainer, make_train_step

__all__ = [
    "AAETrainState",
    "CheckpointManager",
    "Trainer",
    "create_train_state",
    "make_train_step",
]
