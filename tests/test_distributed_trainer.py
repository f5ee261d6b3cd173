"""DistributedModelTrainer end-to-end on the 8-device CPU mesh: trains
Graph2Class, pads the last uneven device group with empty batches, and
produces the same metrics protocol as the single-device trainer."""
import tempfile
from pathlib import Path

import jax
import numpy as np
import optax

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.implementations.typilus.train import create_graph2class_gnn_model
from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.parallel.distributed_trainer import DistributedModelTrainer, default_data_mesh
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs


def tiny_padding():
    return BatchPadding(
        max_nodes=256,
        max_edge_slots=256 * 12,
        max_graphs=8,
        edge_tile=64,
        reference_budgets=(("supernodes", 64), ("token-sequence", 256)),
    )


def make_data(n, seed):
    return LazyDataIterable(
        lambda: synthetic_typilus_graphs(n, seed=seed, mean_nodes=30, max_nodes=80)
    )


def test_distributed_trainer_trains_with_uneven_groups():
    assert len(jax.devices()) >= 8
    model = create_graph2class_gnn_model(hidden_state_size=32, padding=tiny_padding())
    trainer = DistributedModelTrainer(
        model,
        Path(tempfile.mkdtemp()) / "g2c_dp.pkl.gz",
        mesh=default_data_mesh(8),
        zero1=True,
        max_num_epochs=2,
        minibatch_size=3,  # many small batches -> last group is partial
        optimizer_creator=lambda: optax.adam(1e-3),
        clip_gradient_norm=1.0,
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
    )
    trainer.train(
        make_data(40, seed=1),
        make_data(10, seed=2),
        validate_on_start=False,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
    )
    acc = model.report_accuracy(
        iter(make_data(10, seed=3)), trainer.params, trainer.neural_module
    )
    assert 0.0 <= acc <= 1.0
    # Params must come back replicated and finite.
    for leaf in jax.tree_util.tree_leaves(trainer.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
