"""Node embedder for VarMisuse: string label embedding ⊕ is-candidate bit
(reference: ptgnn/implementations/varmisuse/candidateannotatedembeddings.py)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.graph.embedders import StrElementRepresentationModel
from ptgnn_tpu.graph.structs import AbstractNodeEmbedder
from ptgnn_tpu.nn.module import Module, Params


class CandidateNodeAnnotationModule(Module):
    def __init__(self, node_embeddings_module: Module):
        self.node_embedding_module = node_embeddings_module

    def init(self, key: jax.Array) -> Params:
        return {"embedder": self.node_embedding_module.init(key)}

    def apply(self, params: Params, node_data, is_candidate, *, train=False, rng=None):
        embeddings = self.node_embedding_module.apply(
            params["embedder"], **node_data, train=train, rng=rng
        )
        return jnp.concatenate(
            [embeddings, is_candidate[:, None].astype(embeddings.dtype)], axis=-1
        )


class CandidateNodeAnnotationModel(AbstractNeuralModel, AbstractNodeEmbedder):
    def __init__(self, embedding_size: int = 128, **kwargs):
        super().__init__()
        self.__str_node_annotation = StrElementRepresentationModel(
            embedding_size=embedding_size - 1, **kwargs
        )

    def update_metadata_from(self, datapoint: Tuple[str, bool]) -> None:
        self.__str_node_annotation.update_metadata_from(datapoint[0])

    def build_neural_module(self) -> CandidateNodeAnnotationModule:
        return CandidateNodeAnnotationModule(
            node_embeddings_module=self.__str_node_annotation.build_neural_module()
        )

    def tensorize(self, datapoint: Tuple[str, bool]) -> Tuple[Any, bool]:
        return self.__str_node_annotation.tensorize(datapoint[0]), datapoint[1]

    def initialize_minibatch(self) -> Dict[str, Any]:
        return {
            "node_data": self.__str_node_annotation.initialize_minibatch(),
            "is_candidate": [],
        }

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        continue_extending = self.__str_node_annotation.extend_minibatch_with(
            tensorized_datapoint[0], partial_minibatch["node_data"]
        )
        partial_minibatch["is_candidate"].append(tensorized_datapoint[1])
        return continue_extending

    def finalize_minibatch(
        self, accumulated_minibatch_data: Dict[str, Any], pad_to: Optional[int] = None
    ) -> Dict[str, Any]:
        flags = accumulated_minibatch_data["is_candidate"]
        total = pad_to if pad_to is not None else len(flags)
        is_candidate = np.zeros(total, np.float32)
        is_candidate[: len(flags)] = flags
        return {
            "node_data": self.__str_node_annotation.finalize_minibatch(
                accumulated_minibatch_data["node_data"], pad_to=pad_to
            ),
            "is_candidate": is_candidate,
        }

    def representation_size(self) -> int:
        return self.__str_node_annotation.representation_size() + 1
