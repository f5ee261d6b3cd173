"""Data-parallel SPMD training step on the 8-device CPU mesh: gradient
all-reduce equivalence vs a single-device step over the concatenated data,
and ZeRO-1 optimizer-state sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from ptgnn_tpu.implementations.typilus.harness import build_graph2class, small_padding
from ptgnn_tpu.parallel.dp import DataParallel, stack_minibatches

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= N_DEV
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]), ("data",))
    model, module, params, minibatches = build_graph2class(
        padding=small_padding(max_nodes=256, max_graphs=8),
        num_metadata_graphs=32,
        mean_nodes=30,
        max_graph_nodes=80,
        hidden_state_size=32,
        num_minibatches=N_DEV,
        minibatch_size=4,
    )
    return mesh, module, params, minibatches


def test_dp_step_matches_mean_of_per_batch_grads(setup):
    mesh, module, params, minibatches = setup
    opt = optax.sgd(0.1)

    # Single-device reference first (the SPMD step donates its params):
    # mean of per-batch grads with the same per-shard rng
    # (fold_in(axis_index)) as the SPMD program.
    def loss_fn(params, mb, rng):
        loss, metrics = module.apply(params, **mb, train=True, rng=rng)
        return loss.astype(jnp.float32), metrics

    grads_acc = None
    losses = []
    for i, mb in enumerate(minibatches):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb, rng)
        losses.append(float(loss))
        grads_acc = (
            grads
            if grads_acc is None
            else jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        )
    mean_grads = jax.tree_util.tree_map(lambda g: g / N_DEV, grads_acc)
    expected_params = optax.apply_updates(
        params, opt.update(mean_grads, opt.init(params), params)[0]
    )

    dp = DataParallel(module, opt, mesh)
    p_rep = dp.device_put_params(jax.tree_util.tree_map(jnp.copy, params))
    opt_state = dp.init_opt_state(p_rep)
    stacked = dp.device_put_batch(stack_minibatches(minibatches))
    train_step = dp.build_train_step()
    new_params, _, dp_loss, dp_metrics = train_step(
        p_rep, opt_state, stacked, jax.random.PRNGKey(0), 1.0
    )

    np.testing.assert_allclose(float(dp_loss), np.mean(losses), rtol=1e-5)
    for ours, ref in zip(
        jax.tree_util.tree_leaves(new_params), jax.tree_util.tree_leaves(expected_params)
    ):
        # f32 summation order differs between psum and sequential host adds;
        # tolerance covers reduction reordering, not semantic drift.
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=5e-3, atol=5e-4)


def test_zero1_shards_optimizer_state(setup):
    mesh, module, params, minibatches = setup
    dp = DataParallel(module, optax.adam(1e-3), mesh, zero1=True)
    p_rep = dp.device_put_params(jax.tree_util.tree_map(jnp.copy, params))
    opt_state = dp.init_opt_state(p_rep)

    # At least one moment tensor must actually be sharded over the mesh.
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(opt_state)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "ZeRO-1 should shard some optimizer-state tensors"

    stacked = dp.device_put_batch(stack_minibatches(minibatches))
    train_step = dp.build_train_step()
    new_params, new_opt_state, loss, _ = train_step(
        p_rep, opt_state, stacked, jax.random.PRNGKey(0), 1.0
    )
    assert np.isfinite(float(loss))
    # Params remain replicated for the next step.
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert leaf.sharding.is_fully_replicated


def test_weighted_step_ignores_padding_batches(setup):
    """Per-device weights (real-sample counts) must exclude padded empty
    batches from the loss/gradient average (no dilution — the DDP.join
    semantics, reference distributedtrainer.py:55)."""
    mesh, module, params, minibatches = setup
    opt = optax.sgd(0.1)
    n_real = N_DEV - 2  # last two devices get "padding" batches (weight 0)
    weights = np.asarray([4.0] * n_real + [0.0, 0.0], np.float32)

    def loss_fn(params, mb, rng):
        loss, _ = module.apply(params, **mb, train=True, rng=rng)
        return loss.astype(jnp.float32)

    grads_acc = None
    losses = []
    for i, mb in enumerate(minibatches[:n_real]):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
        loss, grads = jax.value_and_grad(loss_fn)(params, mb, rng)
        losses.append(float(loss))
        grads_acc = (
            grads if grads_acc is None
            else jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        )
    mean_grads = jax.tree_util.tree_map(lambda g: g / n_real, grads_acc)
    expected_params = optax.apply_updates(
        params, opt.update(mean_grads, opt.init(params), params)[0]
    )

    dp = DataParallel(module, opt, mesh)
    p_rep = dp.device_put_params(jax.tree_util.tree_map(jnp.copy, params))
    opt_state = dp.init_opt_state(p_rep)
    stacked = dp.device_put_batch(stack_minibatches(minibatches))
    train_step = dp.build_train_step()
    new_params, _, dp_loss, _ = train_step(
        p_rep, opt_state, stacked, jax.random.PRNGKey(0), 1.0, jnp.asarray(weights)
    )

    np.testing.assert_allclose(float(dp_loss), np.mean(losses), rtol=1e-5)
    for ours, ref in zip(
        jax.tree_util.tree_leaves(new_params), jax.tree_util.tree_leaves(expected_params)
    ):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=5e-3, atol=5e-4)
