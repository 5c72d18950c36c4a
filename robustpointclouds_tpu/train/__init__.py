from .loop import TrainState, Trainer, TrainConfig
from .hooks import NaNLadder

__all__ = ["TrainState", "Trainer", "TrainConfig", "NaNLadder"]
