"""Training/eval runtime: optimizers, schedules, train state, loops,
checkpointing, config system."""

from .optim import make_optimizer, no_decay_mask, warmup_step_schedule
from .train import TrainState, create_train_state, make_train_step

__all__ = [
    "make_optimizer", "no_decay_mask", "warmup_step_schedule",
    "TrainState", "create_train_state", "make_train_step",
]
