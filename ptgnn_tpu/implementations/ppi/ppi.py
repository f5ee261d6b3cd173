"""PPI multi-label node classification
(reference: ptgnn/implementations/ppi/ppi.py:13-150).

Per-node BCE-with-logits summed over the 121 labels, masked-mean over valid
(non-padding) nodes; micro P/R/F1 accumulated per batch exactly as the
reference does (per-batch score weighted by node count, ppi.py:43-57).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.core.data import enforce_not_None
from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetwork, GraphNeuralNetworkModel
from ptgnn_tpu.graph.structs import GraphData, TensorizedGraphData
from ptgnn_tpu.implementations.ppi.dataloader import PPIGraphSample
from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.layers import Linear
from ptgnn_tpu.nn.module import Module, Params, fold


class TensorizedPPIData(NamedTuple):
    gnn_data: TensorizedGraphData
    targets: np.ndarray


class PPIClassification(Module):
    def __init__(self, gnn: GraphNeuralNetwork, num_target_classes: int):
        self.gnn = gnn
        self.num_target_classes = num_target_classes
        # Reference: xavier_uniform weight, zero bias (ppi.py:19-21).
        self.output_representation_to_logits = Linear(
            gnn.output_node_state_dim,
            num_target_classes,
            use_bias=True,
            weight_init=init.xavier_uniform(),
            bias_init=init.zeros,
        )

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "gnn": self.gnn.init(k1),
            "to_logits": self.output_representation_to_logits.init(k2),
        }

    def apply(
        self,
        params: Params,
        batch,
        targets,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """targets: [N_pad, C] bool. Returns (loss, metric accumulators)."""
        gnn_output, gnn_metrics = self.gnn.apply(
            params["gnn"], batch, train=train, rng=fold(rng, 0)
        )
        # Per-node loss over EVERY node: a genuine whole-set readout, so
        # under node sharding node_table() pays the one [N, H] all_gather.
        logits = self.output_representation_to_logits.apply(
            params["to_logits"], gnn_output.node_table("output")
        ).astype(jnp.float32)
        node_mask = gnn_output.node_mask  # [N_pad]
        targets_f = targets.astype(jnp.float32)

        # Micro P/R/F1 on the batch (ppi.py:43-57), masked to valid nodes.
        predictions = jax.nn.sigmoid(logits) >= 0.5
        m = node_mask[:, None]
        tp = jnp.sum(jnp.logical_and(predictions, targets) & m)
        fp = jnp.sum(jnp.logical_and(predictions, ~targets) & m)
        fn = jnp.sum(jnp.logical_and(~predictions, targets) & m)
        precision = tp / (tp + fp + 1e-10)
        recall = tp / (tp + fn + 1e-10)
        fscore = 2 * precision * recall / (precision + recall + 1e-10)
        num_samples = jnp.sum(node_mask)

        # BCE-with-logits, sum over labels, mean over valid nodes (ppi.py:59-62).
        per_element = (
            jnp.maximum(logits, 0.0) - logits * targets_f + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        per_node = per_element.sum(axis=-1)
        loss = jnp.sum(jnp.where(node_mask, per_node, 0.0)) / jnp.maximum(
            num_samples, 1
        ).astype(jnp.float32)

        nf = num_samples.astype(jnp.float32)
        metrics = {
            "sum_f1": fscore * nf,
            "sum_pr": precision * nf,
            "sum_re": recall * nf,
            "num_samples": num_samples,
            **gnn_metrics,
        }
        return loss, metrics

    def finalize_metrics(self, accumulated) -> Dict[str, Any]:
        num = max(accumulated.get("num_samples", 0), 1)
        return {
            "f1_score": accumulated.get("sum_f1", 0.0) / num,
            "pr_score": accumulated.get("sum_pr", 0.0) / num,
            "re_score": accumulated.get("sum_re", 0.0) / num,
        }


class PPIMulticlassClassification(
    AbstractNeuralModel[PPIGraphSample, TensorizedPPIData, PPIClassification]
):
    def __init__(self, gnn_model: GraphNeuralNetworkModel):
        super().__init__()
        self.__gnn_model = gnn_model

    @property
    def gnn_model(self) -> GraphNeuralNetworkModel:
        return self.__gnn_model

    def __to_graph_data(self, datapoint: PPIGraphSample) -> GraphData:
        return GraphData(
            node_information=list(datapoint.node_features),
            edges={
                f"e{i}": [tuple(e) for e in a] for i, a in enumerate(datapoint.adjacency_lists)
            },
            reference_nodes={},
        )

    def initialize_metadata(self) -> None:
        self.__num_target_labels: Optional[int] = None

    def update_metadata_from(self, datapoint: PPIGraphSample) -> None:
        self.__gnn_model.update_metadata_from(self.__to_graph_data(datapoint))
        if self.__num_target_labels is None:
            self.__num_target_labels = datapoint.node_labels.shape[1]
        else:
            assert self.__num_target_labels == datapoint.node_labels.shape[1]

    def build_neural_module(self) -> PPIClassification:
        gnn = self.__gnn_model.build_neural_module()
        return PPIClassification(gnn, enforce_not_None(self.__num_target_labels))

    def tensorize(self, datapoint: PPIGraphSample) -> Optional[TensorizedPPIData]:
        graph_tensors = self.__gnn_model.tensorize(self.__to_graph_data(datapoint))
        if graph_tensors is None:
            return None
        return TensorizedPPIData(graph_tensors, datapoint.node_labels)

    def initialize_minibatch(self) -> Dict[str, Any]:
        return {"graph_data": self.__gnn_model.initialize_minibatch(), "labels": []}

    def can_add_to_minibatch(self, tensorized, partial_minibatch) -> bool:
        return self.__gnn_model.can_add_to_minibatch(
            tensorized.gnn_data, partial_minibatch["graph_data"]
        )

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        continue_adding = self.__gnn_model.extend_minibatch_with(
            tensorized_datapoint.gnn_data, partial_minibatch["graph_data"]
        )
        partial_minibatch["labels"].append(tensorized_datapoint.targets)
        return continue_adding

    def finalize_minibatch(self, accumulated_minibatch_data: Dict[str, Any]) -> Dict[str, Any]:
        graph_data = self.__gnn_model.finalize_minibatch(
            accumulated_minibatch_data["graph_data"]
        )
        if accumulated_minibatch_data["labels"]:
            labels = np.concatenate(accumulated_minibatch_data["labels"], axis=0)
        else:
            # Empty minibatch: the distributed trainer pads uneven device
            # groups with fully masked empty batches.
            labels = np.zeros((0, enforce_not_None(self.__num_target_labels)), bool)
        padded = np.zeros((self.__gnn_model.padding.max_nodes, labels.shape[1]), bool)
        padded[: len(labels)] = labels
        return {"batch": graph_data["batch"], "targets": padded}

    def report_metrics(
        self,
        dataset: Iterable[PPIGraphSample],
        params: Params,
        trained_network: PPIClassification,
        max_minibatch_size: int = 50,
    ) -> Dict[str, float]:
        """Evaluation loop (reference: ppi.py:137-150)."""
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
        return trained_network.finalize_metrics(acc.totals())
