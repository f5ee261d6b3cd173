"""Receiver-aligned node sharding (parallel/node_sharding.py): host reshard
invariants, boundary-exchange consistency, and full-train-step parity with
the single-device program on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData
from ptgnn_tpu.parallel.node_sharding import (
    BoundaryBudgetError,
    shard_batch_by_nodes,
    suggest_budgets,
)

S = 4


def build_batch(seed=5, max_nodes=128, agg_rows=16, edge_tile=16, n_graphs=3,
                nodes_per_graph=(40, 35, 30), edges_per_type=60):
    """One batch of graphs that straddle the shard row boundaries."""
    rng = np.random.RandomState(seed)
    pad = BatchPadding(
        max_nodes=max_nodes, max_edge_slots=edge_tile * 256,
        max_graphs=max(4, n_graphs), edge_tile=edge_tile, agg_rows=agg_rows,
        agg_sum_tile=0,
    )
    b = GraphBatcher(2, pad, introduce_backwards_edges=True, add_self_edges=True)
    mb = b.initialize()
    for n in nodes_per_graph:
        adj = [
            (
                rng.randint(0, n, edges_per_type).astype(np.int32),
                rng.randint(0, n, edges_per_type).astype(np.int32),
            )
            for _ in range(2)
        ]
        g = TensorizedGraphData(
            num_nodes=n, node_tensorized_data=[0] * n, adjacency_lists=adj,
            edge_features=None, reference_nodes={},
        )
        assert b.can_add(g, mb)
        b.extend(g, mb)
    batch = b.finalize(mb, node_data={}, reference_names=[])
    return pad, batch


def reshard(batch, **over):
    mb = {"batch": batch}
    kw = dict(boundary_budget=64, interior_slots=16 * 64, boundary_slots=16 * 64)
    kw.update(over)
    return shard_batch_by_nodes(mb, S, **kw)


def test_reshard_preserves_every_edge_once():
    # reorder=None: this asserts the splitting invariant in GLOBAL node ids;
    # semantic parity WITH the BFS renumbering is covered by
    # test_node_parallel_train_step_matches_single_device (reorder default).
    pad, batch = build_batch()
    sharded, stats = reshard(batch, reorder=None)
    sb = sharded["batch"]
    rows_per = pad.max_nodes // S

    # collect (sender_global, receiver_global, type) multisets
    def multiset(senders, receivers, types, mask):
        return sorted(
            (int(s), int(r), int(t))
            for s, r, t, m in zip(senders, receivers, types, mask) if m
        )

    adj = batch.adjacency
    expected = multiset(adj.senders, adj.receivers, adj.edge_types, adj.mask)

    got = []
    ns = sb.node_sharding
    send_idx = np.asarray(ns.send_idx)
    b = send_idx.shape[-1]
    for s in range(S):
        ai = jax.tree_util.tree_map(lambda x: np.asarray(x)[s], sb.adjacency)
        got.extend(
            (int(snd) + s * rows_per, int(rcv) + s * rows_per, int(t))
            for snd, rcv, t, m in zip(ai.senders, ai.receivers, ai.edge_types, ai.mask)
            if m
        )
        ab = jax.tree_util.tree_map(lambda x: np.asarray(x)[s], ns.adjacency_bnd)
        for snd, rcv, t, m in zip(ab.senders, ab.receivers, ab.edge_types, ab.mask):
            if not m:
                continue
            owner, slot = divmod(int(snd), b)
            # resolve through the OWNER's send list for destination s
            global_sender = send_idx[owner, s, slot] + owner * rows_per
            got.append((int(global_sender), int(rcv) + s * rows_per, int(t)))
    assert sorted(got) == expected
    assert stats["boundary_nodes_total"] > 0, "test graphs must straddle shards"


def build_scrambled_chain_batch(seed=7, nodes_per_graph=(40, 35, 30)):
    """Chain graphs whose tensorization order is a random permutation: the
    topology has perfect locality, the numbering hides it."""
    rng = np.random.RandomState(seed)
    pad = BatchPadding(
        max_nodes=128, max_edge_slots=16 * 256, max_graphs=4, edge_tile=16,
        agg_rows=16, agg_sum_tile=0,
    )
    b = GraphBatcher(1, pad, introduce_backwards_edges=True, add_self_edges=False)
    mb = b.initialize()
    for n in nodes_per_graph:
        p = rng.permutation(n).astype(np.int32)
        adj = [(p[:-1], p[1:])]
        g = TensorizedGraphData(
            num_nodes=n, node_tensorized_data=[0] * n, adjacency_lists=adj,
            edge_features=None, reference_nodes={},
        )
        assert b.can_add(g, mb)
        b.extend(g, mb)
    return pad, b.finalize(mb, node_data={}, reference_names=[])


def test_bfs_reorder_recovers_locality():
    """On graphs with local topology but scrambled numbering, the BFS
    renumbering must cut boundary volume by a large factor — this is the
    production case (program graphs are chains/trees; tensorization order
    need not expose it)."""
    _, batch = build_scrambled_chain_batch()
    _, stats_id = reshard(batch, reorder=None)
    _, stats_bfs = reshard(batch)  # default reorder="auto" picks BFS here
    assert stats_bfs["boundary_nodes_total"] > 0  # chains still straddle
    assert (
        stats_bfs["boundary_nodes_total"]
        <= stats_id["boundary_nodes_total"] // 4
    ), (stats_bfs["boundary_nodes_total"], stats_id["boundary_nodes_total"])
    # a chain crossing S-1 range cuts twice (fwd+bwd edge) per graph
    assert stats_bfs["boundary_nodes_total"] <= 8 * len((40, 35, 30))


def test_ast_topology_generator_schema():
    """topology="ast" must produce valid Typilus-schema graphs with mostly
    short-range edges (the locality the reorder relies on)."""
    from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

    offs = []
    for g in synthetic_typilus_graphs(4, seed=0, mean_nodes=120, topology="ast"):
        n = len(g["nodes"])
        assert g["supernodes"]
        for et, adj in g["edges"].items():
            for src, dsts in adj.items():
                assert 0 <= int(src) < n
                for d in dsts:
                    assert 0 <= d < n
                    offs.append(abs(d - int(src)))
    offs = np.asarray(offs)
    assert (offs <= 32).mean() > 0.8, "ast topology should be mostly local"


def test_reshard_budget_error_reports_requirements():
    pad, batch = build_batch()
    with pytest.raises(BoundaryBudgetError) as ei:
        reshard(batch, boundary_budget=1)
    assert "boundary_budget>=" in str(ei.value)
    budgets = suggest_budgets([{"batch": batch}], S)
    sharded, stats = reshard(batch, **budgets)
    assert stats["boundary_budget_used"] <= budgets["boundary_budget"]


def test_exchanged_rows_scale_with_boundary_not_nodes():
    """Exchange volume must be proportional to boundary nodes: a batch of
    graphs that fit entirely inside shard row ranges exchanges ~nothing."""
    # graphs sized exactly rows_per -> no straddling, interior only
    pad, batch = build_batch(nodes_per_graph=(32, 32, 32), edges_per_type=40)
    _, stats = reshard(batch)
    assert stats["boundary_nodes_total"] == 0
    pad2, straddling = build_batch()
    _, stats2 = reshard(straddling)
    assert stats2["boundary_nodes_total"] > 0
    assert stats2["exchanged_rows_real"] == stats2["boundary_nodes_total"]


def _build_g2c(architecture="mlp"):
    from ptgnn_tpu.implementations.typilus.harness import build_graph2class, small_padding

    # dropout off: the sharded layouts reorder edges, so per-edge dropout
    # masks could not match the single-device program bit-for-bit
    return build_graph2class(
        padding=small_padding(max_nodes=256, max_graphs=8),
        num_metadata_graphs=16, mean_nodes=60, max_graph_nodes=120,
        hidden_state_size=32, num_minibatches=1, minibatch_size=8,
        architecture=architecture, dropout_rate=0.0,
    )


@pytest.mark.parametrize("architecture", ["mlp", "ggnn"])
def test_node_parallel_train_step_matches_single_device(architecture):
    """Full Graph2Class train step with nodes partitioned over 4 devices:
    loss and updated params must match the single-device step."""
    import optax

    from ptgnn_tpu.parallel.node_sharding import NodeParallel

    model, module, params, mbs = _build_g2c(architecture)
    mb = mbs[0]
    opt = optax.sgd(0.05)

    def loss_fn(p):
        loss, _ = module.apply(p, **mb, train=True, rng=jax.random.PRNGKey(3))
        return loss

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    budgets = suggest_budgets([mb], 4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("node",))
    npar = NodeParallel(module, opt, mesh, axis="node", **budgets)
    sharded_mb = npar.shard_batch(mb)
    assert npar.last_stats["boundary_nodes_total"] > 0, (
        "parity test must exercise the boundary exchange"
    )
    step = npar.build_train_step(sharded_mb)
    p2 = jax.tree_util.tree_map(jnp.copy, params)
    new_params, opt_state, loss, metrics = step(
        p2, opt.init(p2), sharded_mb, jax.random.PRNGKey(3)
    )
    module.gnn.node_partition_axis = None  # reset static config

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    expected = optax.apply_updates(params, opt.update(ref_grads, opt.init(params))[0])
    for ours, ref in zip(
        jax.tree_util.tree_leaves(new_params), jax.tree_util.tree_leaves(expected)
    ):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=5e-4, atol=1e-5
        )


def test_node_parallel_heterogeneous_stack_matches_single_device():
    """A stack mixing exchange-free layers (GraphNorm, global exchange —
    their boundary all_to_all is skipped entirely), the gather-based
    self-attention MP, and GGNN layers must still match the single-device
    step exactly."""
    import optax

    from ptgnn_tpu.graph.embedders import StrElementRepresentationModel
    from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
    from ptgnn_tpu.graph.messagepassing import GatedMessagePassingLayer
    from ptgnn_tpu.graph.messagepassing.global_exchange import GruGlobalStateUpdate
    from ptgnn_tpu.graph.messagepassing.graphnorm import GraphNorm
    from ptgnn_tpu.graph.messagepassing.selfatt import (
        MultiHeadSelfAttentionMessagePassing,
    )
    from ptgnn_tpu.implementations.typilus.graph2class import Graph2Class
    from ptgnn_tpu.implementations.typilus.harness import small_padding
    from ptgnn_tpu.parallel.node_sharding import NodeParallel
    from ptgnn_tpu.reduceops.varsizedsummary import (
        MultiheadSelfAttentionVarSizedElementReduce,
        NormalizedWeightsVarSizedElementReduce,
        SimpleVarSizedElementReduce,
    )
    from ptgnn_tpu.utils.synthetic import synthetic_typilus_graphs

    H = 32

    def creator(num_edges: int):
        mk = lambda: GatedMessagePassingLayer(
            state_dimension=H, message_dimension=H, num_edge_types=num_edges,
            message_aggregation_function="max", dropout_rate=0.0,
        )
        return [
            mk(),
            GraphNorm(H),
            GruGlobalStateUpdate(
                SimpleVarSizedElementReduce("mean"),
                input_state_size=H, summarized_state_size=H,
            ),
            # Attention-weighted summary under sharding: exercises the
            # distributed segment log-softmax (global shift + denominator)
            # and the recursive sharded query summarizer.
            GruGlobalStateUpdate(
                MultiheadSelfAttentionVarSizedElementReduce(
                    input_representation_size=H, hidden_size=16,
                    output_representation_size=H, num_heads=2,
                    query_representation_summarizer=(
                        NormalizedWeightsVarSizedElementReduce(H, 16)
                    ),
                ),
                input_state_size=H, summarized_state_size=H,
            ),
            MultiHeadSelfAttentionMessagePassing(
                input_state_dimension=H, key_query_dimension=8,
                value_dimension=8, output_dimension=H,
                intermediate_dimension=2 * H, num_heads=2, dropout_rate=0.0,
            ),
            # Reference-subset attention (attends only among supernode rows,
            # writes results back in place) must also match under sharding:
            # reference sets carry global ids, so the gather-based path
            # resolves them against the all_gathered table.
            MultiHeadSelfAttentionMessagePassing(
                input_state_dimension=H, key_query_dimension=8,
                value_dimension=8, output_dimension=H,
                intermediate_dimension=2 * H, num_heads=2, dropout_rate=0.0,
                target_reference="supernodes",
            ),
            mk(),
        ]

    model = Graph2Class(
        gnn_model=GraphNeuralNetworkModel(
            node_representation_model=StrElementRepresentationModel(
                embedding_size=H, token_splitting="subtoken",
                subtoken_combination="mean", vocabulary_size=10000,
                min_freq_threshold=2, dropout_rate=0.0,
            ),
            message_passing_layer_creator=creator,
            padding=small_padding(max_nodes=256, max_graphs=8),
            introduce_backwards_edges=True,
            add_self_edges=True,
            edge_dropout_rate=0.0,
        ),
        max_num_classes=100,
    )

    def data():
        return synthetic_typilus_graphs(16, seed=2, mean_nodes=60, max_nodes=120)

    model.compute_metadata(data(), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))
    mb = next(
        model.minibatch_iterator(
            model.tensorize_dataset(data(), parallelize=False),
            max_minibatch_size=8, parallelize=False,
        )
    )[0]

    def loss_fn(p):
        loss, _ = module.apply(p, **mb, train=True, rng=jax.random.PRNGKey(3))
        return loss

    ref_loss = float(loss_fn(params))

    opt = optax.sgd(0.05)
    budgets = suggest_budgets([mb], 4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("node",))
    npar = NodeParallel(module, opt, mesh, axis="node", **budgets)
    sharded_mb = npar.shard_batch(mb)
    step = npar.build_train_step(sharded_mb)
    _, _, loss, _ = step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), sharded_mb,
        jax.random.PRNGKey(3),
    )
    module.gnn.node_partition_axis = None
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)


def test_node_parallel_per_shard_arrays_scale_down():
    """(a) of the north-star: per-shard node arrays are ~N/S rows."""
    from ptgnn_tpu.parallel.node_sharding import NodeParallel

    model, module, params, mbs = _build_g2c()
    budgets = suggest_budgets(mbs, 4)
    sharded, stats = shard_batch_by_nodes(mbs[0], 4, **budgets)
    sb = sharded["batch"]
    n_pad = mbs[0]["batch"].max_nodes
    for leaf in jax.tree_util.tree_leaves(sb.node_data):
        assert leaf.shape[:2] == (4, n_pad // 4)
    assert stats["rows_per_shard"] == n_pad // 4


def test_graphnorm_matches_under_node_sharding():
    """GraphNorm's per-graph moments must be global (psum over the node
    axis), not per-shard."""
    from ptgnn_tpu.graph.messagepassing import GraphContext
    from ptgnn_tpu.graph.messagepassing.graphnorm import GraphNorm
    from ptgnn_tpu.parallel.dp import _shard_map
    from ptgnn_tpu.parallel.node_sharding import NodeShardCtx
    from jax.sharding import PartitionSpec as P

    pad, batch = build_batch()
    n_pad = pad.max_nodes
    rows_per = n_pad // S
    rng = np.random.RandomState(1)
    x = rng.randn(n_pad, 8).astype(np.float32)
    gn = GraphNorm(8)
    p = gn.init(jax.random.PRNGKey(0))

    ctx_full = GraphContext(
        adjacency=batch.adjacency, edge_features=None,
        node_graph=jnp.asarray(batch.node_graph),
        node_mask=jnp.asarray(batch.node_mask),
        graph_mask=jnp.asarray(batch.graph_mask), references={},
    )
    expected = np.asarray(gn.apply(p, jnp.asarray(x), ctx_full))

    mesh = Mesh(np.asarray(jax.devices()[:S]), ("node",))
    node_graph_sh = np.asarray(batch.node_graph).reshape(S, rows_per)
    node_mask_sh = np.asarray(batch.node_mask).reshape(S, rows_per)

    def per_shard(xs, gs, ms):
        ns = NodeShardCtx(
            axis="node", rows_per=rows_per, adj_int=None, adj_bnd=None,
            h_local=xs[0], recv=None, node_graph_global=None,
            node_mask_global=None,
        )
        ctx = ctx_full._replace(
            node_graph=gs[0], node_mask=ms[0], node_sharding=ns
        )
        return gn.apply(p, xs[0], ctx)

    f = jax.jit(_shard_map(
        per_shard, mesh=mesh, in_specs=(P("node"), P("node"), P("node")),
        out_specs=P("node"),
    ))
    out = np.asarray(f(
        x.reshape(S, rows_per, 8), node_graph_sh, node_mask_sh
    )).reshape(n_pad, 8)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_selfatt_node_sharding_contract():
    """Self-attention MP supports node sharding through a gather-based path
    (exact global attention — including reference-subset mode, whose global
    ids resolve against the gathered table); it never reads the recv buffer,
    so the engine skips its boundary all_to_all."""
    from ptgnn_tpu.graph.messagepassing.selfatt import (
        MultiHeadSelfAttentionMessagePassing,
    )

    assert MultiHeadSelfAttentionMessagePassing.supports_node_sharding is True
    assert MultiHeadSelfAttentionMessagePassing.needs_boundary_exchange is False


def test_node_parallel_edge_features_match_single_device():
    """Edge-feature models train node-sharded: the embedded feature table is
    replicated and gathered per merged edge slot; loss matches the
    single-device step exactly."""
    import optax

    from ptgnn_tpu.graph.embedders import FeatureRepresentationModel
    from ptgnn_tpu.graph.gnn import GraphNeuralNetworkModel
    from ptgnn_tpu.graph.messagepassing import GatedMessagePassingLayer
    from ptgnn_tpu.graph.structs import GraphData
    from ptgnn_tpu.parallel.node_sharding import NodeParallel

    rng = np.random.RandomState(0)
    F = 4

    def make_graph(n=40, e=50):
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.randint(0, n, e), rng.randint(0, n, e))
        ]
        return GraphData(
            node_information=[rng.randn(3).astype(np.float32) for _ in range(n)],
            edges={"E": edges},
            reference_nodes={},
            edge_features={"E": [rng.randn(2).astype(np.float32) for _ in range(e)]},
        )

    pad = BatchPadding(
        max_nodes=128, max_edge_slots=4096, max_graphs=4, edge_tile=32,
        agg_rows=32,
    )
    model = GraphNeuralNetworkModel(
        node_representation_model=FeatureRepresentationModel(embedding_size=8),
        edge_representation_model=FeatureRepresentationModel(embedding_size=F),
        message_passing_layer_creator=lambda n: [
            GatedMessagePassingLayer(
                state_dimension=8, message_dimension=8, num_edge_types=n,
                message_aggregation_function="sum", edge_feature_dimension=F,
            )
        ] * 2,
        padding=pad,
        introduce_backwards_edges=True,
        add_self_edges=True,
    )
    graphs = [make_graph() for _ in range(3)]
    model.compute_metadata(iter(graphs), parallelize=False)

    class _WrappedModule:
        """Minimal loss head over the GNN so NodeParallel can drive it."""

        def __init__(self, gnn):
            self.gnn = gnn

        def init(self, key):
            return self.gnn.init(key)

        def apply(self, params, batch, train=False, rng=None):
            out, metrics = self.gnn.apply(params, batch, train=train, rng=rng)
            h = out.node_table("output")
            mask = out.node_mask
            loss = jnp.sum(
                jnp.where(mask[:, None], h, jnp.zeros((), h.dtype)) ** 2
            ) / jnp.maximum(jnp.sum(mask), 1)
            return loss, metrics

    module = _WrappedModule(model.build_neural_module())
    params = module.init(jax.random.PRNGKey(0))
    mb = next(
        model.minibatch_iterator(
            model.tensorize_dataset(iter(graphs), parallelize=False),
            max_minibatch_size=3, parallelize=False,
        )
    )[0]
    mb = {"batch": mb["batch"]}

    ref_loss, _ = module.apply(params, **mb, train=True, rng=jax.random.PRNGKey(3))
    ref_loss = float(ref_loss)

    budgets = suggest_budgets([mb], 4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("node",))
    npar = NodeParallel(module, optax.sgd(0.05), mesh, axis="node", **budgets)
    sharded_mb = npar.shard_batch(mb)
    assert npar.last_stats["boundary_nodes_total"] > 0
    step = npar.build_train_step(sharded_mb)
    _, _, loss, _ = step(
        jax.tree_util.tree_map(jnp.copy, params),
        optax.sgd(0.05).init(params), sharded_mb, jax.random.PRNGKey(3),
    )
    module.gnn.node_partition_axis = None
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)


def test_single_graph_larger_than_one_shard_trains():
    """(d) of the north-star: a single graph whose node arrays exceed one
    shard's row budget (400 nodes vs 128 rows/shard) trains across the mesh;
    loss decreases over steps and per-shard arrays stay at N/S rows."""
    import optax

    from ptgnn_tpu.implementations.typilus.harness import build_graph2class, small_padding
    from ptgnn_tpu.parallel.node_sharding import NodeParallel

    model, module, params, mbs = build_graph2class(
        padding=small_padding(max_nodes=512, max_graphs=4),
        num_metadata_graphs=6, mean_nodes=400, max_graph_nodes=460,
        hidden_state_size=32, num_minibatches=2, minibatch_size=1,
        dropout_rate=0.0,
    )
    # every batch holds one ~400-node graph: bigger than any 128-row shard
    for mb in mbs:
        assert int(mb["batch"].num_graphs) == 1
        assert int(mb["batch"].num_nodes) > 512 // 4

    budgets = suggest_budgets(mbs, 4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("node",))
    opt = optax.adam(2e-3)
    npar = NodeParallel(module, opt, mesh, axis="node", **budgets)
    sharded = [npar.shard_batch(mb) for mb in mbs]
    assert npar.last_stats["boundary_nodes_total"] > 0
    for leaf in jax.tree_util.tree_leaves(sharded[0]["batch"].node_data):
        assert leaf.shape[:2] == (4, 128)

    step = npar.build_train_step(sharded[0])
    opt_state = opt.init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss, _ = step(
            params, opt_state, sharded[i % len(sharded)], jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    module.gnn.node_partition_axis = None
    assert losses[-1] < losses[0] * 0.9, losses


def test_interior_compute_independent_of_exchange(monkeypatch):
    """(c) of the north-star: interior aggregation must have NO data
    dependency on the boundary all_to_all — that independence is what lets
    the TPU scheduler overlap the collective with interior compute. Proof:
    poison the exchange with NaNs while masking every boundary edge off; the
    loss must stay finite and equal the interior-only result (NaNs reach the
    output through ANY arithmetic use, so the interior path provably never
    touches the recv buffer)."""
    import optax

    from ptgnn_tpu.parallel import node_sharding as nsmod
    from ptgnn_tpu.parallel.node_sharding import NodeParallel

    model, module, params, mbs = _build_g2c()
    budgets = suggest_budgets([mbs[0]], 4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("node",))
    opt = optax.sgd(0.0)
    npar = NodeParallel(module, opt, mesh, axis="node", **budgets)
    smb = npar.shard_batch(mbs[0])

    # mask off every boundary edge so only interior terms reach the loss
    sb = smb["batch"]
    ns = sb.node_sharding
    bnd_masked = ns.adjacency_bnd._replace(
        mask=np.zeros_like(np.asarray(ns.adjacency_bnd.mask)),
        agg_counts=np.zeros_like(np.asarray(ns.adjacency_bnd.agg_counts)),
    )
    smb_int = {**smb, "batch": sb._replace(
        node_sharding=ns._replace(adjacency_bnd=bnd_masked))}

    step = npar.build_train_step(smb)
    _, _, loss_clean, _ = step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), smb_int,
        jax.random.PRNGKey(0),
    )

    real_exchange = nsmod.exchange_boundary

    def poisoned(h_local, send_idx, axis):
        return real_exchange(h_local, send_idx, axis) * jnp.nan

    monkeypatch.setattr(nsmod, "exchange_boundary", poisoned)

    step2 = npar.build_train_step(smb)
    _, _, loss_poisoned, _ = step2(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), smb_int,
        jax.random.PRNGKey(0),
    )
    # control: with boundary edges ACTIVE the poison must reach the loss —
    # NaN recv propagates through the (unmasked) boundary aggregation
    step3 = npar.build_train_step(smb)
    _, _, loss_control, _ = step3(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), smb,
        jax.random.PRNGKey(0),
    )
    module.gnn.node_partition_axis = None

    assert not np.isfinite(float(loss_control)), (
        "control failed: poisoned exchange did not reach the loss through "
        "active boundary edges — the poison mechanism is broken"
    )
    assert np.isfinite(float(loss_poisoned)), (
        "NaN recv leaked into the interior-only loss: interior compute "
        "depends on the exchange"
    )
    np.testing.assert_allclose(float(loss_poisoned), float(loss_clean), rtol=1e-6)
