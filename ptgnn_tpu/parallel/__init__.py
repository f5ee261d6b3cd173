from ptgnn_tpu.parallel.dp import DataParallel, stack_minibatches
from ptgnn_tpu.parallel.distributed_trainer import (
    DistributedModelTrainer,
    default_data_mesh,
    initialize_multi_host,
)

__all__ = [
    "DataParallel",
    "DistributedModelTrainer",
    "default_data_mesh",
    "initialize_multi_host",
    "stack_minibatches",
]
