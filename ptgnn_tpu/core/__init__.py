from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.core.trainer import AbstractScheduler, EndOfEpochHook, ModelTrainer
from ptgnn_tpu.core.metrics import MetricsAccumulator
from ptgnn_tpu.core.data import (
    LazyDataIterable,
    MemorizedDataIterable,
    ShardedLazyDataIterable,
    enforce_not_None,
)

__all__ = [
    "AbstractNeuralModel",
    "AbstractScheduler",
    "EndOfEpochHook",
    "ModelTrainer",
    "MetricsAccumulator",
    "LazyDataIterable",
    "MemorizedDataIterable",
    "ShardedLazyDataIterable",
    "enforce_not_None",
]
