"""VarMisuse: score candidate nodes against a slot node per graph
(reference: ptgnn/implementations/varmisuse/varmisuse.py:16-224).

Per-slot log-softmax over the padded candidate reference set via masked
segment ops; derived "SubtokenOf" vocabulary nodes/edges are added to every
graph host-side exactly as the reference does (varmisuse.py:103-123).
"""
from __future__ import annotations

import re
from itertools import chain
from typing import Any, Dict, Iterator, List, NamedTuple, Optional, Tuple, TypedDict

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetwork, GraphNeuralNetworkModel
from ptgnn_tpu.graph.structs import GraphData, TensorizedGraphData
from ptgnn_tpu.nn.layers import Linear
from ptgnn_tpu.nn.module import Module, Params, fold
from ptgnn_tpu.ops.segment import segment_argmax, segment_log_softmax
from ptgnn_tpu.utils.text import split_identifier_into_parts


class VarMisuseGraph(TypedDict):
    Edges: Dict[str, List[Tuple[int, int]]]
    NodeLabels: Dict[str, str]
    NodeTypes: Dict[str, str]


class SymbolCandidate(TypedDict):
    SymbolDummyNode: int
    SymbolName: str
    IsCorrect: bool


class VarMisuseSample(TypedDict):
    ContextGraph: VarMisuseGraph
    slotTokenIdx: int
    SlotDummyNode: int
    SymbolCandidates: List[SymbolCandidate]


class TensorizedVarMisuseSample(NamedTuple):
    graph: TensorizedGraphData
    target_candidate_node_idx: int
    num_candidate_nodes: int


class VarMisuseGraphModel(Module):
    """Candidate scorer (reference: varmisuse.py:41-91). Assumes one slot per
    graph, as the original data guarantees."""

    def __init__(self, gnn: GraphNeuralNetwork):
        self.gnn = gnn
        self.candidate_scores = Linear(
            2 * gnn.output_node_state_dim, 1, use_bias=False
        )

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {"gnn": self.gnn.init(k1), "candidate_scores": self.candidate_scores.init(k2)}

    def apply(
        self,
        params: Params,
        batch,
        correct_candidate_idxs,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """correct_candidate_idxs: [G_pad] global indices into the padded
        candidate reference array (padding rows ignored via graph_mask)."""
        gnn_output, gnn_metrics = self.gnn.apply(
            params["gnn"], batch, train=train, rng=fold(rng, 0)
        )
        cand_ids = gnn_output.node_idx_references["candidate_nodes"]  # [C_pad]
        cand_graph = gnn_output.node_graph_idx_reference["candidate_nodes"]
        cand_mask = gnn_output.reference_masks["candidate_nodes"]
        slot_ids = gnn_output.node_idx_references["slot_node_idx"]  # [G_pad]
        slot_mask = gnn_output.reference_masks["slot_node_idx"]

        # O(refs*D) readout (sharding-safe): only candidate and slot rows
        # are assembled, never the full node table.
        cand_reps = gnn_output.node_rows(cand_ids)  # [C_pad, H]
        slot_reps = gnn_output.node_rows(slot_ids)  # [G_pad, H] (row i <-> graph i)
        slot_per_cand = jnp.take(
            slot_reps, cand_graph, axis=0, mode="fill", fill_value=0.0
        )  # [C_pad, H]

        num_graphs = gnn_output.graph_mask.shape[0]
        scores = self.candidate_scores.apply(
            params["candidate_scores"],
            jnp.concatenate([cand_reps, slot_per_cand], axis=-1),
        )[:, 0].astype(jnp.float32)
        logprobs = segment_log_softmax(scores, cand_graph, num_graphs, mask=cand_mask)

        safe_correct = jnp.where(slot_mask, correct_candidate_idxs, 0)
        correct_logprobs = jnp.take(logprobs, safe_correct, mode="fill", fill_value=0.0)
        num_slots = jnp.maximum(jnp.sum(slot_mask), 1)
        loss = -jnp.sum(jnp.where(slot_mask, correct_logprobs, 0.0)) / num_slots.astype(
            jnp.float32
        )

        argmax = segment_argmax(scores, cand_graph, num_graphs, mask=cand_mask)  # [G_pad]
        correct = jnp.sum(jnp.logical_and(argmax == safe_correct, slot_mask))
        metrics = {"sum_acc": correct, "num_samples": jnp.sum(slot_mask), **gnn_metrics}
        return loss, metrics

    def finalize_metrics(self, accumulated) -> Dict[str, Any]:
        return {
            "Accuracy": accumulated.get("sum_acc", 0)
            / max(accumulated.get("num_samples", 0), 1)
        }


class VarMisuseModel(
    AbstractNeuralModel[VarMisuseSample, TensorizedVarMisuseSample, VarMisuseGraphModel]
):
    IDENTIFIER_REGEX = re.compile("[a-zA-Z][a-zA-Z0-9]*")

    def __init__(self, gnn_model: GraphNeuralNetworkModel):
        super().__init__()
        self.__gnn_model = gnn_model

    @property
    def gnn_model(self) -> GraphNeuralNetworkModel:
        return self.__gnn_model

    @classmethod
    def __add_subtoken_vocab_nodes(cls, graph: GraphData) -> None:
        """Append one vocabulary node per distinct subtoken appearing in the
        graph's identifier tokens, plus a SubtokenOf edge from each
        vocabulary node to every token node that contains it (behavior of
        reference varmisuse.py:103-123). Token nodes are the NextToken
        backbone; iteration is sorted so derived node numbering is
        deterministic."""
        backbone = sorted(set(chain(*graph.edges.get("NextToken", []))))
        containing_tokens: Dict[str, List[int]] = {}
        for node_idx in backbone:
            text = graph.node_information[node_idx][0]
            if not cls.IDENTIFIER_REGEX.match(text):
                continue
            for part in split_identifier_into_parts(text):
                containing_tokens.setdefault(part, []).append(node_idx)

        subtoken_edges: List[Tuple[int, int]] = []
        for part, token_nodes in containing_tokens.items():
            vocab_node = len(graph.node_information)
            graph.node_information.append((part, False))
            subtoken_edges.extend((vocab_node, t) for t in token_nodes)
        graph.edges["SubtokenOf"] = subtoken_edges

    def update_metadata_from(self, datapoint: VarMisuseSample) -> None:
        graph = datapoint["ContextGraph"]
        graph_data = GraphData(
            node_information=[
                (graph["NodeLabels"][str(i)], False) for i in range(len(graph["NodeLabels"]))
            ],
            edges={t: list(e) for t, e in graph["Edges"].items()},
            # Declare the reference sets (empty) so the GNN registers their
            # names during metadata; they are only populated at tensorize
            # time (the reference passes {} here, varmisuse.py:131).
            reference_nodes={"candidate_nodes": [], "slot_node_idx": []},
        )
        self.__add_subtoken_vocab_nodes(graph_data)
        self.__gnn_model.update_metadata_from(graph_data)

    def build_neural_module(self) -> VarMisuseGraphModel:
        return VarMisuseGraphModel(self.__gnn_model.build_neural_module())

    def tensorize(self, datapoint: VarMisuseSample) -> Optional[TensorizedVarMisuseSample]:
        graph = datapoint["ContextGraph"]
        all_correct_slots = [
            i
            for i, cand_symbol in enumerate(datapoint["SymbolCandidates"])
            if cand_symbol["IsCorrect"]
        ]
        assert len(all_correct_slots) == 1

        candidate_node_ids = {s["SymbolDummyNode"] for s in datapoint["SymbolCandidates"]}
        graph_data = GraphData(
            node_information=[
                (graph["NodeLabels"][str(i)], i in candidate_node_ids)
                for i in range(len(graph["NodeLabels"]))
            ],
            edges={t: list(e) for t, e in graph["Edges"].items()},
            reference_nodes={
                "candidate_nodes": [
                    s["SymbolDummyNode"] for s in datapoint["SymbolCandidates"]
                ],
                "slot_node_idx": [datapoint["SlotDummyNode"]],
            },
        )
        self.__add_subtoken_vocab_nodes(graph_data)
        tensorized_graph_data = self.__gnn_model.tensorize(graph_data)
        if tensorized_graph_data is None:
            return None

        return TensorizedVarMisuseSample(
            graph=tensorized_graph_data,
            target_candidate_node_idx=all_correct_slots[0],
            num_candidate_nodes=len(datapoint["SymbolCandidates"]),
        )

    def initialize_minibatch(self) -> Dict[str, Any]:
        return {
            "graph_data": self.__gnn_model.initialize_minibatch(),
            "correct_candidate_idxs": [],
            "total_num_candidate_nodes": 0,
        }

    def can_add_to_minibatch(self, tensorized, partial_minibatch) -> bool:
        return self.__gnn_model.can_add_to_minibatch(
            tensorized.graph, partial_minibatch["graph_data"]
        )

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        continue_adding = self.__gnn_model.extend_minibatch_with(
            tensorized_datapoint.graph, partial_minibatch["graph_data"]
        )
        partial_minibatch["correct_candidate_idxs"].append(
            tensorized_datapoint.target_candidate_node_idx
            + partial_minibatch["total_num_candidate_nodes"]
        )
        partial_minibatch["total_num_candidate_nodes"] += (
            tensorized_datapoint.num_candidate_nodes
        )
        return continue_adding

    def finalize_minibatch(self, accumulated_minibatch_data: Dict[str, Any]) -> Dict[str, Any]:
        graph_data = self.__gnn_model.finalize_minibatch(
            accumulated_minibatch_data["graph_data"]
        )
        g_pad = self.__gnn_model.padding.max_graphs
        correct = np.zeros(g_pad, np.int32)
        given = accumulated_minibatch_data["correct_candidate_idxs"]
        correct[: len(given)] = given
        return {"batch": graph_data["batch"], "correct_candidate_idxs": correct}

    def report_accuracy(
        self,
        dataset: Iterator[VarMisuseSample],
        params: Params,
        trained_network: VarMisuseGraphModel,
        max_minibatch_size: int = 50,
    ) -> float:
        from ptgnn_tpu.core.metrics import MetricsAccumulator

        eval_step = jax.jit(
            lambda params, mb: trained_network.apply(params, **mb, train=False)
        )
        acc = MetricsAccumulator()
        for mb_data, _ in self.minibatch_iterator(
            self.tensorize_dataset(iter(dataset)), max_minibatch_size=max_minibatch_size
        ):
            _, metrics = eval_step(params, mb_data)
            acc.update(metrics)
        return trained_network.finalize_metrics(acc.totals())["Accuracy"]
