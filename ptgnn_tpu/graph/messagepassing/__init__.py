from ptgnn_tpu.graph.messagepassing.base import (
    AbstractMessageAggregation,
    AbstractMessagePassingLayer,
    GraphContext,
)
from ptgnn_tpu.graph.messagepassing.gated import GatedMessagePassingLayer
from ptgnn_tpu.graph.messagepassing.mlp_mp import MlpMessagePassingLayer, TypedMLP
from ptgnn_tpu.graph.messagepassing.residual import (
    ConcatResidualLayer,
    LinearResidualLayer,
    MeanResidualLayer,
)

__all__ = [
    "AbstractMessageAggregation",
    "AbstractMessagePassingLayer",
    "GraphContext",
    "GatedMessagePassingLayer",
    "MlpMessagePassingLayer",
    "TypedMLP",
    "ConcatResidualLayer",
    "LinearResidualLayer",
    "MeanResidualLayer",
]
