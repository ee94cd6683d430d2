from .checkpoint import restore_checkpoint, save_checkpoint
from .import_ref import import_keras_h5
from .callbacks import Callback, EarlyStopping, LambdaCallback, ModelCheckpoint
from .losses import resolve_loss, resolve_metric
from .trainer import Trainer, TrainState

__all__ = [
    "Trainer",
    "TrainState",
    "Callback",
    "EarlyStopping",
    "ModelCheckpoint",
    "LambdaCallback",
    "resolve_loss",
    "resolve_metric",
    "save_checkpoint",
    "restore_checkpoint",
    "import_keras_h5",
]
