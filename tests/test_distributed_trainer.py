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


def test_dp_gradient_accumulation_matches_weighted_mean_step():
    """Two accumulated device groups with different real-sample weights must
    apply exactly one SGD step on the weighted mean gradient of all four
    device batches (weights include a zero = padding group member)."""
    import jax.numpy as jnp

    from ptgnn_tpu.parallel.dp import DataParallel, stack_minibatches

    model = create_graph2class_gnn_model(hidden_state_size=32, padding=tiny_padding())
    model.compute_metadata(
        synthetic_typilus_graphs(24, seed=5, mean_nodes=30, max_nodes=80),
        parallelize=False,
    )
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mbs = [
        mb
        for mb, _ in model.minibatch_iterator(
            model.tensorize_dataset(
                synthetic_typilus_graphs(24, seed=5, mean_nodes=30, max_nodes=80),
                parallelize=False,
            ),
            max_minibatch_size=3,
            parallelize=False,
        )
    ][:4]
    assert len(mbs) == 4
    mesh = default_data_mesh(2)
    optimizer = optax.sgd(0.1)
    dp = DataParallel(module, optimizer, mesh)
    grad_step, apply_step = dp.build_accum_steps()

    groups = [stack_minibatches(mbs[:2]), stack_minibatches(mbs[2:])]
    weights = [np.asarray([3.0, 1.0], np.float32), np.asarray([2.0, 0.0], np.float32)]
    rngs = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]

    # oracle FIRST (apply_step donates params): weighted mean of the four
    # per-batch gradients at `params`, with each device's rng folded exactly
    # as the SPMD step folds it
    def loss_fn(p, mb, rng):
        return module.apply(p, **mb, train=True, rng=rng)[0]

    flat_w = np.concatenate(weights)
    grads = []
    for i, mb in enumerate(mbs):
        dev_rng = jax.random.fold_in(rngs[i // 2], i % 2)
        grads.append(jax.grad(loss_fn)(params, mb, dev_rng))
    total_w = flat_w.sum()
    mean_grads = jax.tree_util.tree_map(
        lambda *gs: sum(w * g for w, g in zip(flat_w, gs)) / total_w, *grads
    )
    updates, _ = optimizer.update(mean_grads, optimizer.init(params), params)
    expected = optax.apply_updates(params, updates)
    opt_state0 = optimizer.init(params)

    acc = jax.tree_util.tree_map(
        lambda p: jnp.zeros(jnp.shape(p), jnp.float32), params
    )
    w_acc = jnp.float32(0.0)
    for g, w, r in zip(groups, weights, rngs):
        acc, w_acc, _, _ = grad_step(
            params, acc, w_acc, dp.device_put_batch(g), r, dp.device_put_weights(w)
        )
    new_params, _ = apply_step(params, opt_state0, acc, w_acc, 1.0)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_params), jax.tree_util.tree_leaves(expected)
    ):
        # different reduction orders (per-group weighted means re-weighted vs
        # one flat weighted mean) -> f32 noise of a few ulps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert np.all(np.isfinite(np.asarray(leaf)))
