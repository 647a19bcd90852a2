from fenet.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    variables_to_torch_state_dict,
)
from fenet.train.config import TrainConfig
from fenet.train.trainer import TrainState, Trainer, reference_lr_schedule

__all__ = [
    "TrainConfig",
    "TrainState",
    "Trainer",
    "load_checkpoint",
    "reference_lr_schedule",
    "save_checkpoint",
    "variables_to_torch_state_dict",
]
