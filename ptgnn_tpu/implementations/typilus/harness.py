"""Shared setup for the Graph2Class entry point and benchmarks: build the
flagship model on synthetic Typilus-schema data and produce finalized,
statically shaped minibatches."""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class
from ptgnn_tpu.implementations.typilus.train import create_graph2class_gnn_model
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs


def small_padding(max_nodes: int = 512, max_graphs: int = 16) -> BatchPadding:
    return BatchPadding(
        max_nodes=max_nodes,
        max_edge_slots=max_nodes * 12,
        max_graphs=max_graphs,
        edge_tile=64,
        reference_budgets=(
            ("supernodes", max(64, max_nodes // 8)),
            ("token-sequence", max_nodes),
        ),
    )


def build_graph2class(
    *,
    padding: BatchPadding,
    num_metadata_graphs: int = 48,
    mean_nodes: int = 60,
    max_graph_nodes: int = 200,
    hidden_state_size: int = 64,
    seed: int = 0,
    num_minibatches: int = 1,
    minibatch_size: int = 16,
    architecture: str = "mlp",
    dropout_rate: float = 0.1,
    topology: str = "random",
) -> Tuple[Graph2Class, Any, Any, List[Dict[str, Any]]]:
    """Returns (model, module, params, minibatches)."""
    import jax

    model = create_graph2class_gnn_model(
        hidden_state_size=hidden_state_size, padding=padding,
        architecture=architecture, dropout_rate=dropout_rate,
    )

    def data():
        return synthetic_typilus_graphs(
            num_metadata_graphs, seed=seed, mean_nodes=mean_nodes,
            max_nodes=max_graph_nodes, topology=topology,
        )

    model.compute_metadata(data(), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(seed))

    minibatches: List[Dict[str, Any]] = []
    mb_iter = model.minibatch_iterator(
        model.tensorize_dataset(data(), parallelize=False),
        max_minibatch_size=minibatch_size,
        parallelize=False,
    )
    for mb, _ in mb_iter:
        minibatches.append(mb)
        if len(minibatches) >= num_minibatches:
            break
    assert minibatches, "synthetic data produced no minibatches"
    while len(minibatches) < num_minibatches:
        minibatches.append(minibatches[len(minibatches) % len(minibatches)])
    return model, module, params, minibatches
