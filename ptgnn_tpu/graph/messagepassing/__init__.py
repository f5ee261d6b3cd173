from ptgnn_tpu.graph.messagepassing.base import (
    AbstractMessageAggregation,
    AbstractMessagePassingLayer,
    GraphContext,
)
from ptgnn_tpu.graph.messagepassing.egc import EGCMessagePassingLayer
from ptgnn_tpu.graph.messagepassing.gated import GatedMessagePassingLayer
from ptgnn_tpu.graph.messagepassing.global_exchange import (
    AbstractGlobalGraphExchange,
    GruGlobalStateUpdate,
)
from ptgnn_tpu.graph.messagepassing.graphnorm import GraphNorm
from ptgnn_tpu.graph.messagepassing.mlp_mp import MlpMessagePassingLayer, TypedMLP
from ptgnn_tpu.graph.messagepassing.pna import PnaMessageAggregation
from ptgnn_tpu.graph.messagepassing.residual import (
    ConcatResidualLayer,
    LinearResidualLayer,
    MeanResidualLayer,
)
from ptgnn_tpu.graph.messagepassing.selfatt import MultiHeadSelfAttentionMessagePassing

__all__ = [
    "AbstractGlobalGraphExchange",
    "AbstractMessageAggregation",
    "AbstractMessagePassingLayer",
    "GraphContext",
    "EGCMessagePassingLayer",
    "GatedMessagePassingLayer",
    "GraphNorm",
    "GruGlobalStateUpdate",
    "MlpMessagePassingLayer",
    "MultiHeadSelfAttentionMessagePassing",
    "PnaMessageAggregation",
    "TypedMLP",
    "ConcatResidualLayer",
    "LinearResidualLayer",
    "MeanResidualLayer",
]
