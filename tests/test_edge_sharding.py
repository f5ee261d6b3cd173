"""Edge-partitioned aggregation over a mesh axis: sharded result must equal
the single-device masked segment reduce, for sum/mean/max, under shard_map
on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.structs import AdjacencyStruct, BatchPadding, TensorizedGraphData
from ptgnn_tpu.ops.segment import segment_reduce
from ptgnn_tpu.parallel.edge_sharding import shard_adjacency, sharded_aggregate

try:  # jax >= 0.8
    from jax import shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_rep=False)

N_SHARDS = 4


def build_batch():
    rng = np.random.RandomState(5)
    pad = BatchPadding(max_nodes=96, max_edge_slots=128 * 32, max_graphs=4,
                       edge_tile=32, agg_rows=32)
    b = GraphBatcher(2, pad, True, True)
    mb = b.initialize()
    for n in (30, 25):
        adj = [
            (rng.randint(0, n, 30).astype(np.int32), rng.randint(0, n, 30).astype(np.int32))
            for _ in range(2)
        ]
        g = TensorizedGraphData(num_nodes=n, node_tensorized_data=[0] * n,
                                adjacency_lists=adj, edge_features=None, reference_nodes={})
        assert b.can_add(g, mb)
        b.extend(g, mb)
    return pad, b.finalize(mb, node_data={}, reference_names=[])


@pytest.mark.parametrize("reduction", ["sum", "mean", "max"])
def test_sharded_aggregate_matches_single_device(reduction):
    _assert_sharded_matches(reduction)


@pytest.mark.parametrize("reduction", ["sum", "mean", "max"])
def test_sharded_aggregate_pallas_plan_matches(reduction, monkeypatch):
    """The within-shard reduce takes the sorted-segment Pallas kernel path
    (each shard is a tile-aligned slice carrying a valid edge-tile plan) and
    must still match the single-device reduce exactly."""
    monkeypatch.setenv("PTGNN_TPU_FORCE_PALLAS_AGG", "1")
    if jax.default_backend() != "tpu":
        import jax.experimental.pallas as pl

        from ptgnn_tpu.ops.pallas import segment_kernels as sk

        real_call = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            kwargs.pop("cost_estimate", None)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(sk.pl, "pallas_call", patched)
    _assert_sharded_matches(reduction)


def _assert_sharded_matches(reduction):
    pad, batch = build_batch()
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    rng = np.random.RandomState(0)
    messages = jnp.asarray(rng.randn(adj.senders.shape[0], 12).astype(np.float32))

    expected = np.asarray(
        segment_reduce(messages, adj.receivers, pad.max_nodes, reduction, mask=adj.mask)
    )

    sharded = shard_adjacency(adj, N_SHARDS)
    msgs_sharded = messages.reshape(N_SHARDS, -1, 12)

    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("edge",))

    def per_shard(adj_in, local_msgs):
        local_adj = jax.tree_util.tree_map(lambda x: x[0], adj_in)
        # agg_counts is replicated (P()), not shard-leading — keep it whole
        local_adj = local_adj._replace(agg_counts=adj_in.agg_counts)
        return sharded_aggregate(
            local_msgs[0], local_adj, pad.max_nodes, reduction, "edge"
        )

    # counts are replicated; edge-indexed fields sharded on the leading axis
    in_specs = (
        AdjacencyStruct(
            senders=P("edge"), receivers=P("edge"), edge_types=P("edge"),
            tile_types=P("edge"), mask=P("edge"),
            tile_types_transposed=P("edge") if sharded.tile_types_transposed is not None else None,
            local_rows=P("edge"), local_rows_row=P("edge"),
            local_rows_row_super=None,
            tile_row_blocks=P("edge"), agg_counts=P(),
            super_tile_row_blocks=P("edge") if sharded.super_tile_row_blocks is not None else None,
            edge_feature_slot=P("edge") if sharded.edge_feature_slot is not None else None,
        ),
        P("edge"),
    )
    f = jax.jit(_smap(per_shard, mesh, in_specs, P()))
    out = np.asarray(f(sharded, msgs_sharded))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_shard_adjacency_tile_alignment():
    pad, batch = build_batch()
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    sharded = shard_adjacency(adj, N_SHARDS)
    e_per = adj.senders.shape[0] // N_SHARDS
    assert sharded.senders.shape == (N_SHARDS, e_per)
    # each shard's tiles remain type-pure
    tile = adj.edge_tile
    for s in range(N_SHARDS):
        et = np.asarray(sharded.edge_types[s]).reshape(-1, tile)
        assert all(len(set(row)) == 1 for row in et)


def test_edge_parallel_train_step_matches_single_device():
    """Full Graph2Class train step with edges partitioned over 4 devices:
    loss and updated params must match the single-device step."""
    import optax
    from jax.sharding import Mesh
    from ptgnn_tpu.implementations.typilus.harness import build_graph2class, small_padding
    from ptgnn_tpu.parallel.edge_sharding import EdgeParallel

    model, module, params, mbs = build_graph2class(
        padding=small_padding(max_nodes=256, max_graphs=8),
        num_metadata_graphs=16, mean_nodes=30, max_graph_nodes=80,
        hidden_state_size=32, num_minibatches=1, minibatch_size=8,
    )
    mb = mbs[0]
    opt = optax.sgd(0.05)

    # single-device reference (XLA path)
    def loss_fn(p):
        loss, _ = module.apply(p, **mb, train=True, rng=jax.random.PRNGKey(3))
        return loss
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("edge",))
    ep = EdgeParallel(module, opt, mesh, axis="edge")
    sharded_mb = ep.shard_batch(mb)
    step = ep.build_train_step(sharded_mb)
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    new_params, opt_state, loss, metrics = step(
        p2, opt.init(p2), sharded_mb, jax.random.PRNGKey(3)
    )
    module.gnn.edge_partition_axis = None  # reset static config

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    expected = optax.apply_updates(params, opt.update(ref_grads, opt.init(params))[0])
    for ours, ref in zip(jax.tree_util.tree_leaves(new_params),
                         jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=5e-4, atol=1e-5)


def test_pna_aggregation_matches_single_device_under_edge_sharding():
    """PNA's five reductions and the degree scalers must be GLOBAL under
    edge partitioning (one collective per reduction) — a direct segment op
    would return per-shard partial aggregates silently."""
    from ptgnn_tpu.graph.messagepassing import GraphContext
    from ptgnn_tpu.graph.messagepassing.pna import PnaMessageAggregation

    pad, batch = build_batch()
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    rng = np.random.RandomState(0)
    msgs = jnp.asarray(rng.randn(adj.senders.shape[0], 6).astype(np.float32))
    pna = PnaMessageAggregation()

    def ctx_for(a, axis=None):
        return GraphContext(
            adjacency=a, edge_features=None, node_graph=batch.node_graph,
            node_mask=batch.node_mask, graph_mask=batch.graph_mask,
            references={}, edge_axis=axis,
        )

    expected = np.asarray(pna.apply({}, msgs, ctx_for(adj), pad.max_nodes))

    sharded = shard_adjacency(adj, N_SHARDS)
    mesh = Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("edge",))
    adj_specs = jax.tree_util.tree_map(lambda x: P("edge"), sharded)
    adj_specs = adj_specs._replace(agg_counts=P())

    def per_shard(a, m):
        la = jax.tree_util.tree_map(lambda x: x[0], a)._replace(agg_counts=a.agg_counts)
        return pna.apply({}, m[0], ctx_for(la, axis="edge"), pad.max_nodes)

    out = np.asarray(
        jax.jit(_smap(per_shard, mesh, (adj_specs, P("edge")), P()))(
            sharded, msgs.reshape(N_SHARDS, -1, 6)
        )
    )
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)
