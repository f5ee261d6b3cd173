from ptgnn_tpu.nn.module import Module, Params, fold, split_init
from ptgnn_tpu.nn.layers import (
    MLP,
    ACTIVATIONS,
    Conv1d,
    Embedding,
    GRU,
    GRUCell,
    LayerNorm,
    Linear,
    dropout,
    get_activation,
)

__all__ = [
    "Module",
    "Params",
    "fold",
    "split_init",
    "MLP",
    "ACTIVATIONS",
    "Conv1d",
    "Embedding",
    "GRU",
    "GRUCell",
    "LayerNorm",
    "Linear",
    "dropout",
    "get_activation",
]
