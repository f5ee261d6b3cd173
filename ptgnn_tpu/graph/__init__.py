from ptgnn_tpu.graph.structs import (
    AbstractNodeEmbedder,
    AdjacencyStruct,
    BatchPadding,
    GnnOutput,
    GraphBatch,
    GraphData,
    ReferenceSet,
    TensorizedGraphData,
)
from ptgnn_tpu.graph.gnn import GraphNeuralNetwork, GraphNeuralNetworkModel

__all__ = [
    "AbstractNodeEmbedder",
    "AdjacencyStruct",
    "BatchPadding",
    "GnnOutput",
    "GraphBatch",
    "GraphData",
    "GraphNeuralNetwork",
    "GraphNeuralNetworkModel",
    "ReferenceSet",
    "TensorizedGraphData",
]
