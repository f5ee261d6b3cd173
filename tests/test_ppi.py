"""End-to-end PPI: train on learnable synthetic data and check micro-F1
improves over chance, plus the GraphSAGE-format dataloader round-trip."""
import json
import tempfile
from pathlib import Path

import numpy as np
import optax

from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.ppi.dataloader import PPIDatasetLoader, PPIGraphSample
from ptgnn_tpu.implementations.ppi.train import create_ppi_gnn_model
from ptgnn_tpu.utils.synthetic import synthetic_ppi_graphs


def to_samples(raw):
    return [
        PPIGraphSample(
            adjacency_lists=[np.asarray(g["edges"], np.int32)],
            node_features=g["features"],
            node_labels=g["labels"].astype(bool),
        )
        for g in raw
    ]


def small_padding():
    return BatchPadding(max_nodes=512, max_edge_slots=512 * 24, max_graphs=4, edge_tile=64)


def test_ppi_trains_and_f1_beats_chance():
    train = to_samples(
        synthetic_ppi_graphs(16, seed=0, mean_nodes=100, num_labels=16, edges_per_node=5)
    )
    valid = to_samples(
        synthetic_ppi_graphs(4, seed=1, mean_nodes=100, num_labels=16, edges_per_node=5)
    )
    model = create_ppi_gnn_model(hidden_state_size=64, padding=small_padding())
    tmp = tempfile.mkdtemp()
    trainer = ModelTrainer(
        model,
        Path(tmp) / "ppi.pkl.gz",
        max_num_epochs=12,
        minibatch_size=2,
        optimizer_creator=lambda: optax.adam(3e-3),
        clip_gradient_norm=1.0,
        target_validation_metric="f1_score",
        target_validation_metric_higher_is_better=True,
    )
    trainer.train(
        train,
        valid,
        validate_on_start=False,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
        patience=20,
    )
    metrics = model.report_metrics(valid, trainer.params, trainer.neural_module)
    assert set(metrics) == {"f1_score", "pr_score", "re_score"}
    # Labels are ~50/50; a learned model should beat random-guess F1 (~0.5)
    assert metrics["f1_score"] > 0.55, metrics


def test_ppi_dataloader_graphsage_format():
    tmp = Path(tempfile.mkdtemp())
    # two graphs: 3 + 2 nodes
    feats = np.random.RandomState(0).randn(5, 4).astype(np.float32)
    labels = np.random.RandomState(1).randint(0, 2, (5, 3))
    graph_id = np.array([7, 7, 7, 9, 9])
    links = [
        {"source": 0, "target": 1},
        {"source": 2, "target": 0},
        {"source": 3, "target": 4},
    ]
    np.save(tmp / "toy_feats.npy", feats)
    np.save(tmp / "toy_labels.npy", labels)
    np.save(tmp / "toy_graph_id.npy", graph_id)
    with open(tmp / "toy_graph.json", "w") as f:
        json.dump({"links": links}, f)

    samples = PPIDatasetLoader.load_data(tmp, "toy")
    assert len(samples) == 2
    assert samples[0].node_features.shape == (3, 4)
    assert samples[1].node_features.shape == (2, 4)
    np.testing.assert_array_equal(
        samples[0].adjacency_lists[0], np.array([[0, 1], [2, 0]], np.int32)
    )
    np.testing.assert_array_equal(
        samples[1].adjacency_lists[0], np.array([[0, 1]], np.int32)
    )
