"""Engine features with no dedicated coverage yet: edge dropout,
return_all_states, per-step LR schedulers, and shared-weight (GGNN) layers."""
import tempfile
from pathlib import Path

import numpy as np
import optax
import jax
import jax.numpy as jnp

from ptgnn_tpu.core.trainer import ModelTrainer
from ptgnn_tpu.graph.embedders import FeatureRepresentationModel
from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
from ptgnn_tpu.graph.messagepassing import GatedMessagePassingLayer
from ptgnn_tpu.graph.structs import BatchPadding, GraphData


def build_model(edge_dropout=0.0, shared=False, n_layers=3):
    pad = BatchPadding(max_nodes=64, max_edge_slots=2048, max_graphs=4,
                       edge_tile=32, agg_rows=32)

    def creator(n):
        if shared:
            layer = GatedMessagePassingLayer(
                state_dimension=8, message_dimension=8, num_edge_types=n,
                message_aggregation_function="sum")
            return [layer] * n_layers  # shared weights, reference-style
        return [GatedMessagePassingLayer(
            state_dimension=8, message_dimension=8, num_edge_types=n,
            message_aggregation_function="sum") for _ in range(n_layers)]

    return GraphNeuralNetworkModel(
        node_representation_model=FeatureRepresentationModel(embedding_size=8),
        message_passing_layer_creator=creator,
        padding=pad,
        introduce_backwards_edges=True,
        add_self_edges=True,
        edge_dropout_rate=edge_dropout,
    )


def make_graphs(rng, k=3):
    out = []
    for _ in range(k):
        n = 12
        edges = [(int(a), int(b)) for a, b in
                 zip(rng.randint(0, n, 10), rng.randint(0, n, 10))]
        out.append(GraphData(
            node_information=[rng.randn(3).astype(np.float32) for _ in range(n)],
            edges={"E": edges}, reference_nodes={},
        ))
    return out


def run_forward(model, graphs, **apply_kwargs):
    model.compute_metadata(iter(graphs), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mb = next(iter(model.minibatch_iterator(
        model.tensorize_dataset(iter(graphs), parallelize=False),
        max_minibatch_size=4, parallelize=False)))[0]
    out, _ = module.apply(params, mb["batch"], **apply_kwargs)
    return module, params, mb, out


def test_edge_dropout_changes_training_output_and_keeps_eval_deterministic():
    rng = np.random.RandomState(0)
    graphs = make_graphs(rng)
    model = build_model(edge_dropout=0.5)
    module, params, mb, _ = run_forward(model, graphs)
    o1, _ = module.apply(params, mb["batch"], train=True, rng=jax.random.PRNGKey(1))
    o2, _ = module.apply(params, mb["batch"], train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(
        np.asarray(o1.output_node_representations),
        np.asarray(o2.output_node_representations),
    )
    e1, _ = module.apply(params, mb["batch"], train=False)
    e2, _ = module.apply(params, mb["batch"], train=False)
    np.testing.assert_array_equal(
        np.asarray(e1.output_node_representations),
        np.asarray(e2.output_node_representations),
    )
    # gradients remain finite through the runtime-masked fallback path
    def loss(p):
        out, _ = module.apply(p, mb["batch"], train=True, rng=jax.random.PRNGKey(3))
        return jnp.sum(out.output_node_representations ** 2)
    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_return_all_states_concatenates_every_layer():
    rng = np.random.RandomState(1)
    graphs = make_graphs(rng)
    model = build_model(n_layers=3)
    module, params, mb, out = run_forward(model, graphs, return_all_states=True)
    # initial + 3 layer outputs, 8 dims each
    assert out.output_node_representations.shape[-1] == 8 * 4


def test_shared_weight_layers_share_parameters():
    rng = np.random.RandomState(2)
    graphs = make_graphs(rng)
    model = build_model(shared=True, n_layers=3)
    model.compute_metadata(iter(graphs), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    # one shared layer object at 3 positions -> ONE parameter subtree
    # (reference GGNN weight sharing, graph2seq/train.py:54-66)
    assert len(params["mp_layers"]) == 1
    mb = next(iter(model.minibatch_iterator(
        model.tensorize_dataset(iter(graphs), parallelize=False),
        max_minibatch_size=4, parallelize=False)))[0]
    out, _ = module.apply(params, mb["batch"])
    assert np.all(np.isfinite(np.asarray(out.output_node_representations)))

    # separate objects -> separate subtrees
    model2 = build_model(shared=False, n_layers=3)
    model2.compute_metadata(iter(graphs), parallelize=False)
    module2 = model2.build_neural_module()
    assert len(module2.init(jax.random.PRNGKey(0))["mp_layers"]) == 3


def test_scheduler_scales_updates():
    class ZeroScheduler:
        def step(self, epoch_idx, epoch_step):
            return 0.0  # no updates at all

    from tests.test_trainer_lifecycle import SimpleRegressionModel, synthetic_data

    data = synthetic_data(np.random.RandomState(0), 200)
    model = SimpleRegressionModel()
    trainer = ModelTrainer(
        model, Path(tempfile.mkdtemp()) / "m.pkl.gz", max_num_epochs=1,
        minibatch_size=32, optimizer_creator=lambda: optax.sgd(1.0),
        scheduler_creator=lambda: ZeroScheduler(),
    )
    trainer.load_metadata_and_create_network(data, parallelize=False)
    before = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer.train(data, data, initialize_metadata=False, validate_on_start=False,
                  parallelize=False, use_multiprocessing=False, patience=1)
    # zero LR factor -> parameters unchanged by training
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
