from ptgnn_tpu.reduceops.varsizedsummary import (
    AbstractVarSizedElementReduce,
    ElementsToSummaryRepresentationInput,
    MultiheadSelfAttentionVarSizedElementReduce,
    NormalizedWeightsVarSizedElementReduce,
    SelfAttentionVarSizedElementReduce,
    SimpleVarSizedElementReduce,
    WeightedSumVarSizedElementReduce,
)

__all__ = [
    "AbstractVarSizedElementReduce",
    "ElementsToSummaryRepresentationInput",
    "MultiheadSelfAttentionVarSizedElementReduce",
    "NormalizedWeightsVarSizedElementReduce",
    "SelfAttentionVarSizedElementReduce",
    "SimpleVarSizedElementReduce",
    "WeightedSumVarSizedElementReduce",
]
