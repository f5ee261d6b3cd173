"""Scatter-free fused message+aggregation vs the plain path: identical
outputs AND gradients (node states + weights), including the transpose-edge
re-derivation of the sender-keyed gradient and symmetric dropout."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.messagepassing import GraphContext
from ptgnn_tpu.graph.messagepassing.gated import GatedMessagePassingLayer
from ptgnn_tpu.graph.messagepassing.mlp_mp import MlpMessagePassingLayer
from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData
from ptgnn_tpu.ops.pallas import segment_kernels as sk


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    monkeypatch.setenv("PTGNN_TPU_FORCE_PALLAS_AGG", "1")
    if jax.default_backend() != "tpu":
        import jax.experimental.pallas as pl

        real_call = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            kwargs.pop("cost_estimate", None)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(sk.pl, "pallas_call", patched)
    yield


def build_batch(seed=0):
    rng = np.random.RandomState(seed)
    pad = BatchPadding(max_nodes=96, max_edge_slots=6144, max_graphs=4,
                       edge_tile=32, agg_rows=32)
    b = GraphBatcher(2, pad, introduce_backwards_edges=True, add_self_edges=True)
    mb = b.initialize()
    for n in (25, 30):
        adj = [
            (rng.randint(0, n, 20).astype(np.int32), rng.randint(0, n, 20).astype(np.int32))
            for _ in range(2)
        ]
        g = TensorizedGraphData(num_nodes=n, node_tensorized_data=[0] * n,
                                adjacency_lists=adj, edge_features=None, reference_nodes={})
        assert b.can_add(g, mb)
        b.extend(g, mb)
    batch = b.finalize(mb, node_data={}, reference_names=[])
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    ctx = GraphContext(
        adjacency=batch.adjacency, edge_features=None, node_graph=batch.node_graph,
        node_mask=batch.node_mask, graph_mask=batch.graph_mask, references={},
    )
    states = jnp.asarray(rng.randn(pad.max_nodes, 16).astype(np.float32))
    return b, ctx, states


@pytest.mark.parametrize("agg", ["sum", "mean", "max"])
@pytest.mark.parametrize("layer_kind", ["gated", "mlp"])
def test_fused_matches_fallback_values_and_grads(agg, layer_kind, monkeypatch):
    b, ctx, states = build_batch()
    D = states.shape[1]
    if layer_kind == "gated":
        layer = GatedMessagePassingLayer(
            state_dimension=D, message_dimension=D, num_edge_types=b.num_edge_types,
            message_aggregation_function=agg,
        )
    else:
        layer = MlpMessagePassingLayer(
            input_state_dimension=D, output_state_dimension=D, message_dimension=D,
            num_edge_types=b.num_edge_types, message_aggregation_function=agg,
        )
    params = layer.init(jax.random.PRNGKey(0))

    def loss(params, states, force_off):
        if force_off:
            os.environ["PTGNN_TPU_FORCE_PALLAS_AGG"] = "0"
        else:
            os.environ["PTGNN_TPU_FORCE_PALLAS_AGG"] = "1"
        out = layer.apply(params, states, ctx)
        return jnp.sum(jnp.where(ctx.node_mask[:, None], out, 0.0) ** 2)

    l_fast, (gp_fast, gs_fast) = jax.value_and_grad(loss, argnums=(0, 1))(
        params, states, False
    )
    l_ref, (gp_ref, gs_ref) = jax.value_and_grad(loss, argnums=(0, 1))(
        params, states, True
    )
    np.testing.assert_allclose(float(l_fast), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gs_fast), np.asarray(gs_ref), rtol=1e-4, atol=1e-5
    )
    for pf, pr in zip(jax.tree_util.tree_leaves(gp_fast), jax.tree_util.tree_leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pr), rtol=1e-4, atol=1e-5)


def test_fused_dropout_is_pair_symmetric_and_trains():
    """With dropout on, forward must be finite and gradients flow; the mask
    must be identical for an edge and its transpose (checked via the hash)."""
    from ptgnn_tpu.ops.fused_mp import _canonical_edge_key

    b, ctx, states = build_batch(seed=3)
    adj = ctx.adjacency
    key = np.asarray(_canonical_edge_key(adj))
    mask = np.asarray(adj.mask)
    senders = np.asarray(adj.senders)
    receivers = np.asarray(adj.receivers)
    types = np.asarray(adj.edge_types)
    # every real fwd edge (u,v,t<2) must share its key with some (v,u,t+2)
    fwd = mask & (types < 2)
    key_of = {}
    for i in np.nonzero(mask & (types >= 2) & (types < 4))[0]:
        key_of[(senders[i], receivers[i], types[i] - 2)] = key[i]
    matched = 0
    for i in np.nonzero(fwd)[0]:
        k = key_of.get((receivers[i], senders[i], types[i]))
        if k is not None:
            assert k == key[i]
            matched += 1
    assert matched > 0

    layer = GatedMessagePassingLayer(
        state_dimension=16, message_dimension=16, num_edge_types=b.num_edge_types,
        message_aggregation_function="sum", dropout_rate=0.3,
    )
    params = layer.init(jax.random.PRNGKey(0))

    def loss(s):
        out = layer.apply(params, s, ctx, train=True, rng=jax.random.PRNGKey(7))
        return jnp.sum(out ** 2)

    l, g = jax.value_and_grad(loss)(states)
    assert np.isfinite(float(l))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0
