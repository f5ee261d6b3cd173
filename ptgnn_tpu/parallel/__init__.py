from ptgnn_tpu.parallel.dp import DataParallel, stack_minibatches
from ptgnn_tpu.parallel.distributed_trainer import (
    DistributedModelTrainer,
    default_data_mesh,
    initialize_multi_host,
)
from ptgnn_tpu.parallel.edge_sharding import EdgeParallel
from ptgnn_tpu.parallel.node_sharded_trainer import (
    NodeShardedModelTrainer,
    node_data_mesh,
)
from ptgnn_tpu.parallel.node_sharding import (
    BoundaryBudgetError,
    NodeParallel,
    shard_batch_by_nodes,
    suggest_budgets,
)

__all__ = [
    "BoundaryBudgetError",
    "DataParallel",
    "DistributedModelTrainer",
    "EdgeParallel",
    "NodeParallel",
    "NodeShardedModelTrainer",
    "default_data_mesh",
    "initialize_multi_host",
    "node_data_mesh",
    "shard_batch_by_nodes",
    "stack_minibatches",
    "suggest_budgets",
]
