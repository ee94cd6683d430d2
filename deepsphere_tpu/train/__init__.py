from .checkpoint import restore_checkpoint, save_checkpoint
from .losses import resolve_loss, resolve_metric
from .trainer import Trainer, TrainState

__all__ = [
    "Trainer",
    "TrainState",
    "resolve_loss",
    "resolve_metric",
    "save_checkpoint",
    "restore_checkpoint",
]
