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
    # These layouts use small test tiles; force the broadcast kernel anyway
    # so the fused backward's kernel route stays covered on CPU.
    monkeypatch.setenv("PTGNN_TPU_BCAST_MIN_TILE", "1")
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


@pytest.mark.parametrize("agg", ["sum", "mean", "max"])
def test_fused_bf16_backward_matches_fallback_bf16(agg):
    """Under bf16 AMP the fused backward keeps the cotangent kernels in
    bf16 (single-pass one-hot matmuls). The oracle is the PLAIN path on the
    SAME bf16 inputs: forward values are identical, so extremum routing and
    tie-splitting decisions coincide, and the only residual differences are
    bf16 accumulation order (an f32 oracle would differ structurally
    wherever bf16 rounding changes which edge attains the max)."""
    b, ctx, states = build_batch(seed=5)
    D = states.shape[1]
    layer = MlpMessagePassingLayer(
        input_state_dimension=D, output_state_dimension=D, message_dimension=D,
        num_edge_types=b.num_edge_types, message_aggregation_function=agg,
    )
    params = layer.init(jax.random.PRNGKey(0))
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    s16 = states.astype(jnp.bfloat16)

    def loss(params, states, fused):
        os.environ["PTGNN_TPU_FORCE_PALLAS_AGG"] = "1" if fused else "0"
        out = layer.apply(params, states, ctx).astype(jnp.float32)
        return jnp.sum(jnp.where(ctx.node_mask[:, None], out, 0.0) ** 2)

    gp_fast, gs_fast = jax.grad(loss, argnums=(0, 1))(p16, s16, True)
    gp_ref, gs_ref = jax.grad(loss, argnums=(0, 1))(p16, s16, False)
    assert gs_fast.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gs_fast, np.float32), np.asarray(gs_ref, np.float32),
        rtol=0.06, atol=0.06,
    )
    for pf, pr in zip(
        jax.tree_util.tree_leaves(gp_fast), jax.tree_util.tree_leaves(gp_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(pf, np.float32), np.asarray(pr, np.float32),
            rtol=0.06, atol=0.06,
        )


def test_fused_dropout_is_iid_and_grads_match_explicit_mask():
    """Dropout is keyed on the DIRECTED (src, dst, type) edge identity: the
    mask differs between an edge and its transpose (iid), yet the fused
    scatter-free backward must reconstruct each pair's mask exactly. The
    oracle applies the same hash masks explicitly with plain XLA ops."""
    from ptgnn_tpu.ops.fused_mp import (
        _directed_edge_key,
        _keyed_dropout_mask,
        fused_typed_message_aggregation,
    )
    from ptgnn_tpu.ops.segment import segment_sum

    b, ctx, states = build_batch(seed=3)
    adj = ctx.adjacency
    D = states.shape[1]
    T = b.num_edge_types
    rng = np.random.RandomState(1)
    weights = jnp.asarray(rng.randn(T, 2 * D, D).astype(np.float32) * 0.1)
    seed = jnp.uint32(1234567)
    keep = 0.7

    # masks differ between a fwd edge and its transpose (iid check)
    key_fwd = np.asarray(_directed_edge_key(adj.senders, adj.receivers, adj.edge_types))
    mask_np = np.asarray(adj.mask)
    senders, receivers = np.asarray(adj.senders), np.asarray(adj.receivers)
    types = np.asarray(adj.edge_types)
    fwd_keys = {}
    for i in np.nonzero(mask_np & (types < 2))[0]:
        fwd_keys[(senders[i], receivers[i], types[i])] = key_fwd[i]
    diffs = 0
    for i in np.nonzero(mask_np & (types >= 2) & (types < 4))[0]:
        k = fwd_keys.get((receivers[i], senders[i], types[i] - 2))
        if k is not None and (senders[i], receivers[i]) != (receivers[i], senders[i]):
            diffs += int(k != key_fwd[i])
    assert diffs > 0, "transpose edges should have their own masks"

    def fused_loss(x):
        out = fused_typed_message_aggregation(
            x, weights, (adj, seed), x.shape[0], "sum", True, keep
        )
        return jnp.sum(out ** 2)

    def oracle_loss(x):
        src = jnp.take(x, jnp.minimum(adj.senders, x.shape[0] - 1), axis=0)
        tgt = jnp.take(x, jnp.minimum(adj.receivers, x.shape[0] - 1), axis=0)
        inp = jnp.concatenate([src, tgt], axis=-1)
        m = _keyed_dropout_mask(
            seed, _directed_edge_key(adj.senders, adj.receivers, adj.edge_types),
            inp.shape[1], 1.0 - keep,
        )
        inp = jnp.where(m, inp / keep, 0.0)
        w_e = jnp.take(weights, adj.edge_types, axis=0)  # [E, 2D, D]
        msgs = jnp.einsum("ed,edm->em", inp, w_e)
        out = segment_sum(msgs, adj.receivers, x.shape[0], mask=adj.mask)
        return jnp.sum(out ** 2)

    l_f, g_f = jax.value_and_grad(fused_loss)(states)
    l_o, g_o = jax.value_and_grad(oracle_loss)(states)
    np.testing.assert_allclose(float(l_f), float(l_o), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o), rtol=1e-3, atol=1e-4)

    # and the layer still trains with dropout on
    layer = GatedMessagePassingLayer(
        state_dimension=D, message_dimension=D, num_edge_types=T,
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



def test_fused_masked_dw_route_matches_fallback():
    """Wide-D small-T configs (the PPI shape class) take the per-type
    masked-dot dW route instead of the [n_tiles, Din, M] per-tile
    intermediate + segment_sum; gradients must match the plain path."""
    b, ctx, _ = build_batch()
    rng = np.random.RandomState(3)
    D = 192  # din = 2D = 384, m = 192 -> masked route wins the traffic test
    states = jnp.asarray(rng.randn(ctx.node_mask.shape[0], D).astype(np.float32))
    layer = MlpMessagePassingLayer(
        input_state_dimension=D, output_state_dimension=D, message_dimension=D,
        num_edge_types=b.num_edge_types, message_aggregation_function="sum",
    )
    # sanity: this config really is on the masked side of the traffic gate
    e_pad = ctx.adjacency.senders.shape[0]
    n_tiles = ctx.adjacency.tile_types.shape[0]
    assert b.num_edge_types * e_pad * (2 * D + D) * 4 < 2 * n_tiles * 2 * D * D * 4

    params = layer.init(jax.random.PRNGKey(0))

    def loss(params, states, force_off):
        os.environ["PTGNN_TPU_FORCE_PALLAS_AGG"] = "0" if force_off else "1"
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
    for pf, pr in zip(
        jax.tree_util.tree_leaves(gp_fast), jax.tree_util.tree_leaves(gp_ref)
    ):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pr), rtol=1e-4, atol=1e-4)


def test_pallas_typed_matmul_route_matches_xla(monkeypatch):
    """The scalar-prefetch typed-matmul kernel (wide-D/small-T route, PPI
    shapes) must match the XLA gathered-stack route — values and custom-VJP
    grads — in interpreter mode on CPU."""
    import jax.experimental.pallas as pl_mod

    from ptgnn_tpu.ops import typed_linear as tl

    if jax.default_backend() != "tpu":
        real_call = pl_mod.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            kwargs.pop("cost_estimate", None)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(pl_mod, "pallas_call", patched)

    rng = np.random.RandomState(1)
    nt, tile, d, m, T = 12, 16, 256, 128, 3
    x = jnp.asarray(rng.randn(nt * tile, d).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(T, d, m) * 0.05).astype(np.float32))
    tt = jnp.asarray(np.sort(rng.randint(0, T, nt)).astype(np.int32))

    def loss(force, xx, ww):
        monkeypatch.setenv("PTGNN_TPU_TYPED_MM_PALLAS", force)
        y = tl.typed_tile_matmul(xx, ww, tt, tile)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    v1, (gx1, gw1) = jax.value_and_grad(
        lambda a, b: loss("1", a, b), argnums=(0, 1)
    )(x, w)
    v0, (gx0, gw0) = jax.value_and_grad(
        lambda a, b: loss("0", a, b), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(gx1, np.float32), np.asarray(gx0, np.float32), rtol=5e-2, atol=5e-2
    )
    # dW precision paths differ (bf16 products under XLA autodiff vs the
    # custom bwd's f32-accumulated masked dots): tolerance, not bitwise.
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), rtol=5e-2, atol=0.5)
