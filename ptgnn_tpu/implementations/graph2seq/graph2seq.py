"""Graph2Seq: encode a code graph, decode the method name with a copy
mechanism (reference: ptgnn/implementations/graph2seq/graph2seq.py:24-205).

The decoder memories are the backbone-sequence node representations gathered
from the padded backbone reference set; the decoder's initial state is a
multi-head self-attention reduce over [input ⊕ output] node representations
of each graph. Decoder target rows align 1:1 with graph slots.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple, TypedDict

import jax
import jax.numpy as jnp

from ptgnn_tpu.core.data import enforce_not_None
from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetwork, GraphNeuralNetworkModel
from ptgnn_tpu.graph.structs import GnnOutput, GraphData, TensorizedGraphData
from ptgnn_tpu.nn.module import Module, Params, fold
from ptgnn_tpu.reduceops import (
    AbstractVarSizedElementReduce,
    ElementsToSummaryRepresentationInput,
    MultiheadSelfAttentionVarSizedElementReduce,
    SimpleVarSizedElementReduce,
)
from ptgnn_tpu.sequence.grucopydecoder import (
    DecoderData,
    GruCopyingDecoder,
    GruCopyingDecoderModel,
    TokenizedOutput,
)


class CodeGraph2Seq(TypedDict):
    backbone_sequence: List[int]
    node_labels: List[str]
    edges: Dict[str, List[Tuple[int, int]]]
    method_name: List[str]


class TensorizedGraph2Seq(NamedTuple):
    encoder_data: TensorizedGraphData
    decoder_data: TokenizedOutput


class Graph2SeqModule(Module):
    def __init__(
        self,
        gnn: GraphNeuralNetwork,
        decoder: GruCopyingDecoder,
        node_to_graph_representation: AbstractVarSizedElementReduce,
    ):
        self.gnn = gnn
        self.decoder = decoder
        self.node_to_graph_representation = node_to_graph_representation

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "gnn": self.gnn.init(k1),
            "decoder": self.decoder.init(k2),
            "summarizer": self.node_to_graph_representation.init(k3),
        }

    def _get_initial_decoder_states(self, params, gnn_output: GnnOutput):
        """(reference: graph2seq.py:55-65), masked over padding nodes."""
        # The graph summary reduces over EVERY node, so under node sharding
        # this is a genuine whole-set readout: node_table() pays one
        # [N, D+H] all_gather (documented O(N*D) boundary of this head).
        return self.node_to_graph_representation.apply(
            params["summarizer"],
            ElementsToSummaryRepresentationInput(
                element_embeddings=jnp.concatenate(
                    (
                        gnn_output.node_table("input"),
                        gnn_output.node_table("output"),
                    ),
                    axis=-1,
                ),
                element_to_sample_map=gnn_output.node_to_graph_idx,
                num_samples=gnn_output.graph_mask.shape[0],
                mask=gnn_output.node_mask,
            ),
        )

    def _encode(self, params, batch, *, train: bool, rng):
        gnn_output, gnn_metrics = self.gnn.apply(
            params["gnn"], batch, train=train, rng=fold(rng, 0)
        )
        memories = gnn_output.reference_rows("backbone_nodes")  # [M_pad, H]
        origin = gnn_output.node_graph_idx_reference["backbone_nodes"]
        memory_mask = gnn_output.reference_masks["backbone_nodes"]
        initial_states = self._get_initial_decoder_states(params, gnn_output)
        return memories, origin, memory_mask, initial_states, gnn_metrics

    def apply(
        self,
        params: Params,
        batch,
        target_token_ids,
        target_lengths,
        copy_matrix,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        memories, origin, memory_mask, initial_states, gnn_metrics = self._encode(
            params, batch, train=train, rng=rng
        )
        loss, dec_metrics = self.decoder.apply(
            params["decoder"],
            input_memories=memories,
            input_memories_origin_idx=origin,
            memory_mask=memory_mask,
            initial_states=initial_states,
            target_token_ids=target_token_ids,
            target_lengths=target_lengths,
            copy_matrix=copy_matrix,
            train=train,
            rng=fold(rng, 1),
        )
        metrics = {
            "loss_sum": loss,
            "num_mbs": jnp.int32(1),
            **dec_metrics,
            **gnn_metrics,
        }
        return loss, metrics

    def finalize_metrics(self, accumulated) -> Dict[str, Any]:
        return {"loss": accumulated.get("loss_sum", 0.0) / max(accumulated.get("num_mbs", 0), 1)}


class Graph2Seq(AbstractNeuralModel[CodeGraph2Seq, TensorizedGraph2Seq, Graph2SeqModule]):
    def __init__(
        self,
        gnn_model: GraphNeuralNetworkModel,
        decoder: GruCopyingDecoderModel,
        num_summarization_heads: int = 8,
    ):
        super().__init__()
        self.__gnn_model = gnn_model
        self.__decoder_model = decoder
        self.num_summarization_heads = num_summarization_heads

    @property
    def gnn_model(self) -> GraphNeuralNetworkModel:
        return self.__gnn_model

    @property
    def decoder_model(self) -> GruCopyingDecoderModel:
        return self.__decoder_model

    def __to_graph_data(self, datapoint: CodeGraph2Seq) -> Tuple[GraphData, List[str]]:
        graph_nodes = [l.lower() for l in datapoint["node_labels"]]
        return (
            GraphData(
                node_information=graph_nodes,
                edges={t: list(edges) for t, edges in datapoint["edges"].items()},
                reference_nodes={"backbone_nodes": datapoint["backbone_sequence"]},
            ),
            graph_nodes,
        )

    def update_metadata_from(self, datapoint: CodeGraph2Seq) -> None:
        graph_data, graph_nodes = self.__to_graph_data(datapoint)
        self.__gnn_model.update_metadata_from(graph_data)
        self.__decoder_model.update_metadata_from(
            DecoderData(
                input_elements=[graph_nodes[k] for k in datapoint["backbone_sequence"]],
                target_data=datapoint["method_name"],
            )
        )

    def build_neural_module(self) -> Graph2SeqModule:
        gnn = self.__gnn_model.build_neural_module()
        decoder = self.__decoder_model.build_neural_module()
        node_to_graph_representation = MultiheadSelfAttentionVarSizedElementReduce(
            input_representation_size=gnn.input_node_state_dim + gnn.output_node_state_dim,
            hidden_size=gnn.input_node_state_dim + gnn.output_node_state_dim,
            output_representation_size=gnn.output_node_state_dim,
            num_heads=self.num_summarization_heads,
            query_representation_summarizer=SimpleVarSizedElementReduce("max"),
        )
        return Graph2SeqModule(gnn, decoder, node_to_graph_representation)

    def tensorize(self, datapoint: CodeGraph2Seq) -> Optional[TensorizedGraph2Seq]:
        graph_data_raw, graph_nodes = self.__to_graph_data(datapoint)
        graph_data = self.__gnn_model.tensorize(graph_data_raw)
        if graph_data is None:
            return None
        target_data = self.__decoder_model.tensorize(
            DecoderData(
                input_elements=[graph_nodes[k] for k in datapoint["backbone_sequence"]],
                target_data=datapoint["method_name"],
            )
        )
        return TensorizedGraph2Seq(encoder_data=graph_data, decoder_data=target_data)

    def initialize_minibatch(self) -> Dict[str, Any]:
        return {
            "encoder_mb_data": self.__gnn_model.initialize_minibatch(),
            "decoder_mb_data": self.__decoder_model.initialize_minibatch(),
        }

    def can_add_to_minibatch(self, tensorized, partial_minibatch) -> bool:
        return self.__gnn_model.can_add_to_minibatch(
            tensorized.encoder_data, partial_minibatch["encoder_mb_data"]
        )

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        continue_adding = self.__gnn_model.extend_minibatch_with(
            tensorized_datapoint.encoder_data, partial_minibatch["encoder_mb_data"]
        )
        continue_adding &= self.__decoder_model.extend_minibatch_with(
            tensorized_datapoint.decoder_data, partial_minibatch["decoder_mb_data"]
        )
        return continue_adding

    def finalize_minibatch(self, accumulated_minibatch_data: Dict[str, Any]) -> Dict[str, Any]:
        encoder = self.__gnn_model.finalize_minibatch(
            accumulated_minibatch_data["encoder_mb_data"]
        )
        decoder = self.__decoder_model.finalize_minibatch(
            accumulated_minibatch_data["decoder_mb_data"],
            max_targets=self.__gnn_model.padding.max_graphs,
            memories_budget=self.__gnn_model.padding.reference_budget("backbone_nodes"),
        )
        return {"batch": encoder["batch"], **decoder}

    def _decode_minibatches(
        self,
        data: List[CodeGraph2Seq],
        params: Params,
        trained_network: Graph2SeqModule,
        decode_fn,
        max_minibatch_size: int,
    ) -> List:
        """Shared encode-then-decode loop: jitted GNN encode per minibatch
        (cached per network object), then ``decode_fn(kwargs)`` on the
        decoder inputs. Used by greedy_decode and beam_decode."""
        cache = getattr(self, "_encode_jit_cache", None)
        if cache is None:
            cache = {}
            self._encode_jit_cache = cache
        encode = cache.get(id(trained_network))
        if encode is None:
            encode = jax.jit(
                lambda params, batch: trained_network._encode(
                    params, batch, train=False, rng=None
                )[:4]
            )
            cache[id(trained_network)] = encode
        # Tensorize carrying each sample's POSITION as the input_data (the
        # minibatch driver treats it as opaque): dropped samples then align
        # by index rather than by identity/equality, which misassigns results
        # when the dataset contains equal duplicates and one copy is dropped
        # by the size caps.
        from ptgnn_tpu.core.iterators import ThreadedIterator

        indexed_stream = ThreadedIterator(
            ((self.tensorize(d), i) for i, d in enumerate(data)), enabled=True
        )
        decoded: List = []
        survivor_idx: List[int] = []
        for mb_data, mb_indices in self.minibatch_iterator(
            (s for s in indexed_stream if s[0] is not None),
            max_minibatch_size=max_minibatch_size,
        ):
            input_concrete_values: List[str] = []
            for i in mb_indices:
                sample = data[enforce_not_None(i)]
                input_concrete_values.extend(
                    sample["node_labels"][k].lower() for k in sample["backbone_sequence"]
                )
            memories, origin, memory_mask, initial_states = encode(params, mb_data["batch"])
            survivor_idx.extend(mb_indices)
            decoded.extend(
                decode_fn(
                    input_concrete_values=input_concrete_values,
                    input_memories=memories,
                    input_memories_origin_idx=origin,
                    memory_mask=memory_mask,
                    initial_states=initial_states,
                    params=params["decoder"],
                    neural_module=trained_network.decoder,
                    num_real_targets=len(mb_indices),
                )
            )
        if len(decoded) == len(data):
            return decoded
        # Some samples were dropped (size caps at tensorize, or not fitting
        # an empty batch): slot None at their positions.
        import logging

        logging.getLogger(__name__).warning(
            "decode: %d of %d samples were dropped by size caps; their "
            "results are None.", len(data) - len(decoded), len(data),
        )
        aligned: List = [None] * len(data)
        for i, result in zip(survivor_idx, decoded):
            aligned[i] = result
        return aligned

    def greedy_decode(
        self,
        data: List[CodeGraph2Seq],
        params: Params,
        trained_network: Graph2SeqModule,
        max_minibatch_size: int = 50,
    ) -> List[Tuple[List[str], float]]:
        """(reference: graph2seq.py:175-205)"""
        return self._decode_minibatches(
            data, params, trained_network,
            self.__decoder_model.greedy_decode, max_minibatch_size,
        )

    def beam_decode(
        self,
        data: List[CodeGraph2Seq],
        params: Params,
        trained_network: Graph2SeqModule,
        beam_size: int = 5,
        max_minibatch_size: int = 50,
    ) -> List[List[Tuple[List[str], float]]]:
        """Beam search over the joint vocab ∪ copy space — beyond the
        reference, which only ships greedy (graph2seq.py:175-205). Returns
        per sample the ``beam_size`` best sequences with logprobs,
        best-first."""
        import functools

        return self._decode_minibatches(
            data, params, trained_network,
            functools.partial(self.__decoder_model.beam_decode, beam_size=beam_size),
            max_minibatch_size,
        )
