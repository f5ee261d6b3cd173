"""End-to-end VarMisuse: subtoken-vocab node derivation, training, accuracy
above chance on label-matching synthetic data."""
import tempfile
from pathlib import Path

import optax

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.structs import BatchPadding, GraphData
from ptgnn_tpu.implementations.varmisuse.train import create_var_misuse_gnn_model
from ptgnn_tpu.implementations.varmisuse.varmisuse import VarMisuseModel
from ptgnn_tpu.utils.synthetic import synthetic_varmisuse_samples


def tiny_padding():
    return BatchPadding(
        max_nodes=1024,
        max_edge_slots=1024 * 10,
        max_graphs=8,
        edge_tile=64,
        reference_budgets=(("candidate_nodes", 64), ("slot_node_idx", 8)),
    )


def make_data(n, seed):
    return LazyDataIterable(lambda: synthetic_varmisuse_samples(n, seed=seed))


def test_subtoken_vocab_nodes_added():
    sample = next(synthetic_varmisuse_samples(1, seed=0))
    graph = sample["ContextGraph"]
    gd = GraphData(
        node_information=[
            (graph["NodeLabels"][str(i)], False) for i in range(len(graph["NodeLabels"]))
        ],
        edges={t: list(e) for t, e in graph["Edges"].items()},
        reference_nodes={},
    )
    n_before = len(gd.node_information)
    VarMisuseModel._VarMisuseModel__add_subtoken_vocab_nodes(gd)
    assert "SubtokenOf" in gd.edges
    assert len(gd.edges["SubtokenOf"]) > 0
    assert len(gd.node_information) > n_before
    # all SubtokenOf targets are token nodes; sources are new vocab nodes
    for src, dst in gd.edges["SubtokenOf"]:
        assert src >= n_before or not gd.node_information[src][1]


def test_varmisuse_trains_above_chance():
    model = create_var_misuse_gnn_model(hidden_state_size=32, padding=tiny_padding())
    tmp = tempfile.mkdtemp()
    trainer = ModelTrainer(
        model,
        Path(tmp) / "vm.pkl.gz",
        max_num_epochs=25,
        minibatch_size=4,
        optimizer_creator=lambda: optax.adam(2e-3),
        clip_gradient_norm=1.0,
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
    )
    trainer.train(
        make_data(32, seed=1),
        make_data(8, seed=2),
        validate_on_start=False,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
        patience=20,
    )
    acc = model.report_accuracy(
        iter(make_data(16, seed=3)), trainer.params, trainer.neural_module
    )
    # 4 candidates -> chance 0.25; the slot label copies the correct
    # candidate's name so a trained model should beat chance clearly.
    assert acc > 0.4, acc
