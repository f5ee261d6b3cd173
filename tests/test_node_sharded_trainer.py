"""NodeShardedModelTrainer (parallel/node_sharded_trainer.py): the hybrid
data x node mesh step's parity with single-device math, budget auto-probe,
over-budget fallback, and the full training lifecycle on the CPU mesh."""
import tempfile
from pathlib import Path

import numpy as np
import optax

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ptgnn_tpu.core.data import LazyDataIterable
from ptgnn_tpu.implementations.typilus.harness import build_graph2class, small_padding
from ptgnn_tpu.parallel.node_sharded_trainer import (
    NodeShardedModelTrainer,
    node_data_mesh,
)
from ptgnn_tpu.parallel.node_sharding import NodeParallel, suggest_budgets
from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs


def _build_two_batches():
    return build_graph2class(
        padding=small_padding(max_nodes=256, max_graphs=8),
        num_metadata_graphs=24, mean_nodes=60, max_graph_nodes=120,
        hidden_state_size=32, num_minibatches=2, minibatch_size=8,
        dropout_rate=0.0,
    )


def test_hybrid_mesh_step_matches_weighted_single_device():
    """One (data=2, node=4) hybrid step over two different minibatches must
    equal one single-device step on the equally weighted mean gradient —
    gradients psum over the data axis, the boundary all_to_all confined to
    the node axis (BASELINE.json configs[4]'s composition)."""
    model, module, params, mbs = _build_two_batches()
    assert len(mbs) == 2
    opt = optax.sgd(0.05)

    def grads_of(mb):
        def loss_fn(p):
            loss, _ = module.apply(p, **mb, train=True, rng=jax.random.PRNGKey(3))
            return loss

        return jax.value_and_grad(loss_fn)(params)

    (l0, g0), (l1, g1) = grads_of(mbs[0]), grads_of(mbs[1])
    mean_grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
    expected_params = optax.apply_updates(
        params, opt.update(mean_grads, opt.init(params))[0]
    )
    expected_loss = (float(l0) + float(l1)) / 2

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "node"))
    budgets = suggest_budgets(mbs, 4)
    npar = NodeParallel(
        module, opt, mesh, axis="node", data_axis="data", **budgets
    )
    group = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[npar.shard_batch(mb) for mb in mbs]
    )
    train_step, eval_step = npar.build_trainer_steps()
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    # NOTE: the hybrid grads_fn folds the data index into the rng; with
    # dropout_rate=0.0 the rng never reaches a sampling site, so single-
    # device parity is exact.
    new_params, _, loss, metrics = train_step(
        p2, opt.init(params), npar.device_put_batch(group),
        jax.random.PRNGKey(3), 1.0, npar.device_put_weights([1.0, 1.0]),
    )
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-5)
    for ours, ref in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(expected_params),
    ):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=5e-4, atol=1e-5
        )
    # metrics are psum'd over data: edges from BOTH batches
    expected_edges = sum(int(mb["batch"].num_edges) for mb in mbs)
    assert int(metrics["num_edges"]) == expected_edges

    # eval step: weighted mean loss over the data axis, padding weight 0
    loss_e, _, wsum = eval_step(
        jax.tree_util.tree_map(np.asarray, params),
        npar.device_put_batch(group),
        npar.device_put_weights([1.0, 0.0]),
    )
    module.gnn.node_partition_axis = None
    np.testing.assert_allclose(float(loss_e), _eval_loss(module, params, mbs[0]),
                               rtol=1e-5)
    assert float(wsum) == 1.0


def _eval_loss(module, params, mb):
    loss, _ = module.apply(params, **mb, train=False)
    return float(loss)


def test_zero1_moments_sharded_over_data_axis():
    model, module, params, mbs = _build_two_batches()
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "node"))
    budgets = suggest_budgets(mbs, 4)
    npar = NodeParallel(
        module, optax.adam(1e-3), mesh, axis="node", data_axis="data",
        zero1=True, **budgets,
    )
    module.gnn.node_partition_axis = None
    opt_state = npar.init_opt_state(npar.device_put_params(params))
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(opt_state)
        if hasattr(leaf, "sharding") and getattr(leaf, "ndim", 0) >= 1
        and leaf.shape[0] > 0 and leaf.shape[0] % 2 == 0
    ]
    assert specs
    assert any(s and s[0] == "data" for s in specs), specs[:5]


def _train_data(n=24, seed=1):
    return LazyDataIterable(
        lambda: synthetic_typilus_graphs(
            n, seed=seed, mean_nodes=60, max_nodes=120
        )
    )


def _make_trainer(tmp, mesh=None, node_shards=4, **over):
    from ptgnn_tpu.implementations.typilus.train import create_graph2class_gnn_model

    model = create_graph2class_gnn_model(
        hidden_state_size=32, padding=small_padding(max_nodes=256, max_graphs=8),
    )
    kwargs = dict(
        node_shards=node_shards,
        mesh=mesh,
        max_num_epochs=3,
        minibatch_size=8,
        optimizer_creator=lambda: optax.adam(1e-3),
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
    )
    kwargs.update(over)
    return model, NodeShardedModelTrainer(model, Path(tmp) / "g2c.pkl.gz", **kwargs)


def test_node_sharded_trainer_end_to_end_hybrid():
    """Full lifecycle on the (2, 4) hybrid mesh: budget auto-probe, multi-
    epoch training with validation, best-checkpoint restore. This is the
    'graphs larger than one chip become trainable' mode as a product."""
    tmp = tempfile.mkdtemp()
    model, trainer = _make_trainer(tmp, mesh=node_data_mesh(4))
    assert trainer.data_size == 2
    trainer.train(
        _train_data(24, seed=1),
        _train_data(8, seed=2),
        validate_on_start=True,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
        patience=5,
    )
    assert trainer._budgets is not None, "budgets must have been auto-probed"
    assert (Path(tmp) / "g2c.pkl.gz").exists()
    # restored best params drive a plain (unsharded) eval: accuracy is sane
    acc = model.report_accuracy(
        synthetic_typilus_graphs(8, seed=2, mean_nodes=60, max_nodes=120),
        jax.tree_util.tree_map(np.asarray, trainer.params),
        trainer.neural_module,
    )
    assert 0.0 <= acc <= 1.0


def test_node_sharded_trainer_pure_node_mesh():
    """data axis of size 1 (pure 1 x 4 node mesh): groups are single sharded
    minibatches, no data-axis collectives."""
    tmp = tempfile.mkdtemp()
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("data", "node"))
    model, trainer = _make_trainer(tmp, mesh=mesh, max_num_epochs=1)
    assert trainer.data_size == 1
    trainer.train(
        _train_data(16, seed=1),
        _train_data(6, seed=2),
        validate_on_start=False,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
        patience=5,
    )
    assert (Path(tmp) / "g2c.pkl.gz").exists()


def test_node_sharded_trainer_gradient_accumulation():
    """gradient_accumulation_steps=2 on the hybrid mesh: k accumulated
    groups apply one weighted-mean optimizer step (DataParallel accum
    protocol implemented by NodeParallel)."""
    tmp = tempfile.mkdtemp()
    model, trainer = _make_trainer(
        tmp, mesh=node_data_mesh(4), max_num_epochs=1,
        gradient_accumulation_steps=2,
    )
    trainer.train(
        _train_data(24, seed=1),
        _train_data(6, seed=2),
        validate_on_start=False,
        parallelize=False,
        use_multiprocessing=False,
        store_tensorized_data_in_memory=True,
        patience=5,
    )
    assert (Path(tmp) / "g2c.pkl.gz").exists()


def test_node_sharded_trainer_resume_with_optimizer_state():
    """Crash-resume on the hybrid mesh: a fresh trainer restores the model
    AND the .optimizerstate checkpoint, re-materializes the moments through
    NodeParallel.init_opt_state's restored branch, and continues training."""
    tmp = tempfile.mkdtemp()
    model, trainer = _make_trainer(tmp, mesh=node_data_mesh(4), max_num_epochs=2)
    trainer.train(
        _train_data(16, seed=1), _train_data(6, seed=2),
        validate_on_start=False, parallelize=False, use_multiprocessing=False,
        store_tensorized_data_in_memory=True, patience=5,
    )
    ckpt = Path(tmp) / "g2c.pkl.gz"
    assert ckpt.exists() and ckpt.with_suffix(".optimizerstate").exists()

    # the CLI resume flow: restore the pickled model (with its metadata),
    # hand it to a fresh trainer, and restore params + optimizer state
    from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class

    model2, _ = Graph2Class.restore_model(ckpt)
    trainer2 = NodeShardedModelTrainer(
        model2, ckpt, node_shards=4, mesh=node_data_mesh(4),
        max_num_epochs=3, minibatch_size=8,
        optimizer_creator=lambda: optax.adam(1e-3),
        target_validation_metric="Accuracy",
        target_validation_metric_higher_is_better=True,
    )
    trainer2.restore_parameters(ckpt, restore_optimizer=True)
    assert trainer2._start_epoch_override == 2, "resume epoch from checkpoint"
    trainer2.train(
        _train_data(16, seed=1), _train_data(6, seed=2),
        initialize_metadata=False, validate_on_start=False,
        parallelize=False, use_multiprocessing=False,
        store_tensorized_data_in_memory=True, patience=5,
    )
    assert trainer2.params is not None


def test_over_budget_batch_is_skipped_with_log(caplog):
    """A batch exceeding the frozen budgets must be skipped with a warning,
    not crash the epoch (and the skip must be counted)."""
    import logging

    tmp = tempfile.mkdtemp()
    model, trainer = _make_trainer(
        tmp,
        mesh=node_data_mesh(4),
        # tiny frozen budgets: every real batch is over budget
        budgets=dict(boundary_budget=1, interior_slots=128, boundary_slots=128),
    )
    trainer.load_metadata_and_create_network(
        _train_data(8, seed=1), parallelize=False
    )
    trainer._build_step_functions(optax.adam(1e-3))
    mb, _ = next(
        model.minibatch_iterator(
            model.tensorize_dataset(iter(_train_data(8, seed=1)), parallelize=False),
            max_minibatch_size=8, parallelize=False,
        )
    )
    with caplog.at_level(logging.WARNING):
        assert trainer._prepare_minibatch(mb) is None
    assert trainer._epoch_shard_stats["skipped"] == 1
    assert any("exceeds the frozen node-sharding" in r.message for r in caplog.records)


def test_budgets_reprobed_on_first_training_pass(caplog):
    """validate_on_start=True probes budgets from the VALIDATION set first;
    those are provisional — the first training pass re-probes and takes the
    elementwise max, so a small validation fold cannot freeze budgets that
    silently skip (larger) training batches all run long."""
    import logging

    tmp = tempfile.mkdtemp()
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("data", "node"))
    model, trainer = _make_trainer(tmp, mesh=mesh, max_num_epochs=1)
    small_valid = LazyDataIterable(
        lambda: synthetic_typilus_graphs(6, seed=2, mean_nodes=20, max_nodes=40)
    )
    with caplog.at_level(logging.INFO):
        trainer.train(
            _train_data(16, seed=1),  # mean 60 nodes: bigger than validation
            small_valid,
            validate_on_start=True,
            parallelize=False,
            use_multiprocessing=False,
            store_tensorized_data_in_memory=True,
            patience=5,
        )
    probes = [r for r in caplog.records
              if "Node-sharding budgets probed" in r.getMessage()]
    assert any("validation" in r.getMessage() for r in probes), probes
    assert any("training" in r.getMessage() for r in probes), probes
    assert trainer._budgets_provisional is False
    # nothing was skipped: the training re-probe covered the bigger batches
    assert trainer._epoch_shard_stats["skipped"] == 0
