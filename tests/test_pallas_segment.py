"""Pallas sorted-segment kernels vs the XLA reference segment ops.

On CPU these run through the Pallas interpreter (`interpret=True` is forced
via env detection inside the test); values and gradients must match the
masked XLA ops exactly (fp32)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ptgnn_tpu.ops import segment_max, segment_mean, segment_min, segment_sum
from ptgnn_tpu.ops.pallas import segment_kernels as sk


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        import jax.experimental.pallas as pl

        real_call = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            kwargs.pop("cost_estimate", None)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(sk.pl, "pallas_call", patched)
    yield


def make_case(seed=0, E=700, N=100, D=64, R=32, tile=128, pad_edges=60):
    rng = np.random.RandomState(seed)
    receivers = rng.randint(0, N, E).astype(np.int32)
    full_recv = np.concatenate([receivers, np.full(pad_edges, N, np.int32)])
    mask = np.concatenate([np.ones(E, bool), np.zeros(pad_edges, bool)])
    data = rng.randn(E + pad_edges, D).astype(np.float32)
    plan = sk.build_aggregation_plan(
        full_recv, mask, N, rows_per_block=R, agg_tile=tile,
        num_tiles=sk.plan_num_tiles(E + pad_edges, N, R, tile),
    )
    plan = jax.tree_util.tree_map(jnp.asarray, plan)
    return data, full_recv, mask, plan, N


@pytest.mark.parametrize("reduction", ["sum", "mean", "max", "min"])
def test_planned_reduce_matches_reference(reduction):
    data, recv, mask, plan, N = make_case()
    out = np.asarray(
        sk.planned_segment_reduce(
            jnp.asarray(data), jnp.asarray(recv), plan, N, reduction, jnp.asarray(mask)
        )
    )
    ref_fn = {
        "sum": segment_sum, "mean": segment_mean, "max": segment_max, "min": segment_min,
    }[reduction]
    expected = np.asarray(
        ref_fn(jnp.asarray(data), jnp.asarray(recv), N, mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_empty_and_single_segment_nodes():
    """Nodes with 0 edges -> 0; heavy-hitter nodes spanning tiles."""
    rng = np.random.RandomState(3)
    N, D, R, tile = 40, 16, 16, 64
    # node 5 gets 200 edges (spans multiple tiles); nodes 30..39 get none
    receivers = np.concatenate([np.full(200, 5), rng.randint(0, 30, 100)]).astype(np.int32)
    mask = np.ones(len(receivers), bool)
    data = rng.randn(len(receivers), D).astype(np.float32)
    plan = jax.tree_util.tree_map(
        jnp.asarray,
        sk.build_aggregation_plan(receivers, mask, N, R, tile,
                                  num_tiles=sk.plan_num_tiles(len(receivers), N, R, tile)),
    )
    for reduction in ("sum", "max"):
        out = np.asarray(
            sk.planned_segment_reduce(
                jnp.asarray(data), jnp.asarray(receivers), plan, N, reduction,
                jnp.asarray(mask),
            )
        )
        ref = {"sum": segment_sum, "max": segment_max}[reduction]
        expected = np.asarray(ref(jnp.asarray(data), jnp.asarray(receivers), N))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
        assert np.allclose(out[30:], 0.0)


@pytest.mark.parametrize("reduction", ["sum", "mean", "max"])
def test_planned_reduce_gradients(reduction):
    data, recv, mask, plan, N = make_case(seed=7, E=300, N=50, D=16, R=16, tile=64, pad_edges=20)
    jd, jr, jm = jnp.asarray(data), jnp.asarray(recv), jnp.asarray(mask)

    def fast(d):
        return jnp.sum(sk.planned_segment_reduce(d, jr, plan, N, reduction, jm) ** 2)

    ref_fn = {"sum": segment_sum, "mean": segment_mean, "max": segment_max}[reduction]

    def ref(d):
        return jnp.sum(ref_fn(d, jr, N, mask=jm) ** 2)

    g_fast = np.asarray(jax.grad(fast)(jd))
    g_ref = np.asarray(jax.grad(ref)(jd))
    np.testing.assert_allclose(g_fast, g_ref, rtol=1e-4, atol=1e-5)


def test_batch_layout_aggregation_matches_fallback():
    """The batcher's unified layout drives the kernel without any gather;
    results must equal the XLA fallback on the same batch."""
    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData

    rng = np.random.RandomState(0)
    pad = BatchPadding(max_nodes=96, max_edge_slots=4096, max_graphs=4,
                       edge_tile=32, agg_rows=32)
    b = GraphBatcher(3, pad, True, True)
    mb = b.initialize()
    for n in (20, 30, 25):
        adj = [
            (rng.randint(0, n, 15).astype(np.int32), rng.randint(0, n, 15).astype(np.int32))
            for _ in range(3)
        ]
        g = TensorizedGraphData(num_nodes=n, node_tensorized_data=[0] * n,
                                adjacency_lists=adj, edge_features=None, reference_nodes={})
        assert b.can_add(g, mb)
        b.extend(g, mb)
    batch = b.finalize(mb, node_data={}, reference_names=[])
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)

    # layout invariants: tiles pure in type and row block, receivers sorted
    # within (block, type) segments
    tile = pad.edge_tile
    et = np.asarray(batch.adjacency.edge_types).reshape(-1, tile)
    assert all(len(set(row)) == 1 for row in et)
    rb = np.asarray(batch.adjacency.tile_row_blocks)
    assert (np.diff(rb) >= 0).all()
    recv = np.asarray(batch.adjacency.receivers)
    lr = np.asarray(batch.adjacency.local_rows)[:, 0]
    mask = np.asarray(batch.adjacency.mask)
    np.testing.assert_array_equal(
        lr[mask], recv[mask] - np.repeat(rb, tile)[mask] * pad.agg_rows
    )

    data = jnp.asarray(rng.randn(len(recv), 16).astype(np.float32))
    for reduction in ("sum", "mean", "max", "min"):
        fast = np.asarray(
            sk.adjacency_segment_reduce(data, adj, pad.max_nodes, reduction, adj.mask)
        )
        from ptgnn_tpu.ops import segment_reduce

        ref = np.asarray(
            segment_reduce(data, adj.receivers, pad.max_nodes, reduction, mask=adj.mask)
        )
        np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5, err_msg=reduction)


def _batch_with_super(edge_tile=8, agg_sum_tile=32, agg_rows=16, seed=3):
    """A batcher-built batch whose layout has supertile-aligned block runs."""
    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData

    rng = np.random.RandomState(seed)
    pad = BatchPadding(
        max_nodes=64, max_edge_slots=512, max_graphs=4, edge_tile=edge_tile,
        agg_rows=agg_rows, agg_sum_tile=agg_sum_tile,
    )
    b = GraphBatcher(2, pad, True, True)
    mb = b.initialize()
    for n in (20, 14):
        adj = []
        for _ in range(2):
            e = rng.randint(4, 10)
            adj.append(
                (rng.randint(0, n, e).astype(np.int32), rng.randint(0, n, e).astype(np.int32))
            )
        b.extend(
            TensorizedGraphData(
                num_nodes=n, node_tensorized_data=[0] * n, adjacency_lists=adj,
                edge_features=None, reference_nodes={},
            ),
            mb,
        )
    return pad, b.finalize(mb, node_data={}, reference_names=[])


def test_supertile_layout_invariants():
    pad, batch = _batch_with_super()
    adj = batch.adjacency
    assert adj.super_tile_row_blocks is not None
    k = pad.agg_sum_tile // pad.edge_tile
    grouped = np.asarray(adj.tile_row_blocks).reshape(-1, k)
    np.testing.assert_array_equal(grouped, np.repeat(grouped[:, :1], k, axis=1))
    np.testing.assert_array_equal(np.asarray(adj.super_tile_row_blocks), grouped[:, 0])
    # every tile still type-pure and row-block-pure (edge-level check)
    et = np.asarray(adj.edge_types).reshape(-1, pad.edge_tile)
    np.testing.assert_array_equal(et, np.repeat(et[:, :1], pad.edge_tile, axis=1))


@pytest.mark.parametrize("reduction", ["sum", "mean", "max", "min"])
def test_adjacency_reduce_with_supertiles_matches_reference(reduction):
    pad, batch = _batch_with_super()
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    rng = np.random.RandomState(7)
    data = rng.randn(pad.max_edge_slots, 16).astype(np.float32)
    out = np.asarray(
        sk.adjacency_segment_reduce(
            jnp.asarray(data), adj, pad.max_nodes, reduction, mask=adj.mask
        )
    )
    ref_fn = {
        "sum": segment_sum, "mean": segment_mean, "max": segment_max, "min": segment_min,
    }[reduction]
    expected = np.asarray(
        ref_fn(jnp.asarray(data), adj.receivers, pad.max_nodes, mask=adj.mask)
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduction", ["max", "min", "sum"])
def test_planned_reduce_bf16_exact(reduction, monkeypatch):
    """bf16 data through the extremum kernel (with the gated single-pass
    bf16 selection enabled — interpreter-only; it hangs Mosaic on v5e) and
    the bf16 sum path; selection of bf16-exact run extrema must match the
    XLA reference BITWISE on the same bf16 inputs — including all-masked
    runs (degenerate magnitudes -> 0) and empty segments."""
    if jax.default_backend() == "tpu":
        pytest.skip("bf16 selection matmul hangs Mosaic on v5e (gated off)")
    monkeypatch.setenv("PTGNN_TPU_EXT_BF16_SEL", "1")
    rng = np.random.RandomState(11)
    N, D, R, tile = 48, 32, 16, 64
    # node 7 heavy (multi-tile run), nodes 40.. empty, plus a node whose
    # every edge is masked (all-masked run -> torch-scatter fill 0)
    receivers = np.concatenate(
        [np.full(150, 7), rng.randint(0, 38, 120), np.full(9, 39)]
    ).astype(np.int32)
    mask = np.ones(len(receivers), bool)
    mask[-9:] = False  # node 39: only masked edges
    data = rng.randn(len(receivers), D).astype(np.float32)
    data_bf16 = jnp.asarray(data).astype(jnp.bfloat16)
    plan = jax.tree_util.tree_map(
        jnp.asarray,
        sk.build_aggregation_plan(
            receivers, mask, N, R, tile,
            num_tiles=sk.plan_num_tiles(len(receivers), N, R, tile),
        ),
    )
    out = np.asarray(
        sk.planned_segment_reduce(
            data_bf16, jnp.asarray(receivers), plan, N, reduction, jnp.asarray(mask)
        ).astype(jnp.float32)
    )
    ref_fn = {"sum": segment_sum, "max": segment_max, "min": segment_min}[reduction]
    expected = np.asarray(
        ref_fn(data_bf16, jnp.asarray(receivers), N, mask=jnp.asarray(mask)).astype(
            jnp.float32
        )
    )
    if reduction == "sum":
        np.testing.assert_allclose(out, expected, rtol=2e-2, atol=2e-2)  # order
    else:
        np.testing.assert_array_equal(out, expected)  # pure selection: exact
    assert np.allclose(out[39], 0.0) and np.allclose(out[40:], 0.0)


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_broadcast_to_edges_matches_take(dtype):
    """planned_broadcast_to_edges == table[receivers] in plan order, BITWISE
    (one-hot selection), with 0 at padding slots."""
    data, recv, mask, plan, N = make_case()
    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.randn(N, 48).astype(np.float32))
    if dtype == "bfloat16":
        table = table.astype(jnp.bfloat16)
    out = np.asarray(
        sk.planned_broadcast_to_edges(table, jnp.asarray(recv), plan).astype(jnp.float32)
    )
    perm = np.asarray(plan.perm)
    expected = np.zeros((perm.size, 48), np.float32)
    valid = perm < len(recv)
    rows = recv[perm[valid]]
    in_range = rows < N
    expected[np.nonzero(valid)[0][in_range]] = np.asarray(
        table.astype(jnp.float32)
    )[rows[in_range]]
    np.testing.assert_array_equal(out, expected)


def test_broadcast_vjp_is_segment_sum():
    """d table of sum(broadcast(table) * w) == scatter-add of w by receiver
    (padding slots contribute nothing)."""
    data, recv, mask, plan, N = make_case()
    rng = np.random.RandomState(4)
    table = jnp.asarray(rng.randn(N, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(plan.perm.shape[0], 32).astype(np.float32))

    def f(t):
        return (sk.planned_broadcast_to_edges(t, jnp.asarray(recv), plan) * w).sum()

    got = np.asarray(jax.grad(f)(table))
    expected = np.zeros((N, 32), np.float32)
    perm = np.asarray(plan.perm)
    valid = np.logical_and(perm < len(recv), np.asarray(mask)[np.minimum(perm, len(recv) - 1)])
    np.add.at(expected, recv[perm[valid]], np.asarray(w)[valid])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_adjacency_broadcast_supertile_bitwise(monkeypatch):
    """The adjacency-level broadcast (supertile plan) equals the masked take
    on a real batcher layout, bitwise, for f32 and bf16."""
    monkeypatch.setenv("PTGNN_TPU_BCAST_MIN_TILE", "1")  # small test tiles
    pad, batch = _batch_with_super()
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    rng = np.random.RandomState(5)
    for dt in (jnp.float32, jnp.bfloat16):
        table = jnp.asarray(rng.randn(pad.max_nodes, 24).astype(np.float32)).astype(dt)
        out = np.asarray(sk.adjacency_broadcast_to_edges(table, adj).astype(jnp.float32))
        recv = np.asarray(adj.receivers)
        safe = np.minimum(recv, pad.max_nodes - 1)
        expected = np.where(
            (recv < pad.max_nodes)[:, None] & np.asarray(adj.mask)[:, None],
            np.asarray(table.astype(jnp.float32))[safe],
            0.0,
        )
        np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize("reduction", ["sum", "max", "min"])
def test_adjacency_identity_plan_gradients_match_reference(reduction, monkeypatch):
    """Gradients through adjacency_segment_reduce on an identity-order plan
    (the broadcast-kernel backward path) match the XLA reference segment
    ops' gradients — covers the planned sum/extremum VJPs' broadcast route,
    including tie splitting."""
    from ptgnn_tpu.ops import segment_reduce

    monkeypatch.setenv("PTGNN_TPU_BCAST_MIN_TILE", "1")  # small test tiles
    pad, batch = _batch_with_super()
    adj = jax.tree_util.tree_map(jnp.asarray, batch.adjacency)
    rng = np.random.RandomState(6)
    base = rng.randn(adj.senders.shape[0], 8).astype(np.float32)
    # inject exact ties inside and across tiles so tie-splitting is exercised
    base[3] = base[2]
    base[10] = base[2]
    data = jnp.asarray(base)

    def planned_loss(d):
        out = sk.adjacency_segment_reduce(d, adj, pad.max_nodes, reduction, adj.mask)
        return (out * jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)).sum()

    def ref_loss(d):
        out = segment_reduce(d, adj.receivers, pad.max_nodes, reduction, mask=adj.mask)
        return (out * jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)).sum()

    got = np.asarray(jax.grad(planned_loss)(data))
    expected = np.asarray(jax.grad(ref_loss)(data))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduction", ["sum", "max", "mean"])
def test_derive_rows_mode_bitwise(reduction, monkeypatch):
    """PTGNN_TPU_DERIVE_ROWS=1 batches ship no local_rows_row[_super]; the
    kernel wrappers derive the sublane-replicated operand in-trace
    (sk.rows_row_operand). Results must be BITWISE the shipped-operand
    path's — the derivation is a pure layout replication. (Interpreter/CPU
    coverage: the in-trace derivation hangs Mosaic on the current v5e
    toolchain, so the gate stays off by default; see graph/batching.py.)"""
    pad, batch_shipped = _batch_with_super(seed=9)
    monkeypatch.setenv("PTGNN_TPU_DERIVE_ROWS", "1")
    _, batch_derive = _batch_with_super(seed=9)
    adj_s = jax.tree_util.tree_map(jnp.asarray, batch_shipped.adjacency)
    adj_d = jax.tree_util.tree_map(jnp.asarray, batch_derive.adjacency)
    assert adj_s.local_rows_row is not None
    assert adj_d.local_rows_row is None and adj_d.local_rows_row_super is None
    # the derived operand is layout-identical to the host-built one
    plan_s = sk.plan_from_adjacency(adj_s)
    plan_d = sk.plan_from_adjacency(adj_d)
    np.testing.assert_array_equal(
        np.asarray(sk.rows_row_operand(plan_d)), np.asarray(plan_s.local_rows_row)
    )
    rng = np.random.RandomState(11)
    data = jnp.asarray(rng.randn(adj_s.senders.shape[0], 8).astype(np.float32))

    def run(adj):
        out = sk.adjacency_segment_reduce(
            data, adj, pad.max_nodes, reduction, adj.mask,
            counts_exact=reduction == "mean",
        )
        bc = sk.adjacency_broadcast_to_edges(out, adj)
        return np.asarray(out), np.asarray(bc)

    out_s, bc_s = run(adj_s)
    out_d, bc_d = run(adj_d)
    np.testing.assert_array_equal(out_s, out_d)
    np.testing.assert_array_equal(bc_s, bc_d)
