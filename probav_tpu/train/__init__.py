from probav_tpu.train.trainer import ModelTrainer, TrainState
from probav_tpu.train.optim import build_optimizer, staged_decay
from probav_tpu.train.metrics import Mean, ScalarLogger

__all__ = [
    "ModelTrainer", "TrainState",
    "build_optimizer", "staged_decay",
    "Mean", "ScalarLogger",
]
