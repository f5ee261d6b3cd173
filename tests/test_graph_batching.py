"""Batcher layout tests: flattening offsets, type-blocking, padding, budgets."""
import numpy as np

from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData


def make_graph(num_nodes, adj_per_type, refs=None):
    return TensorizedGraphData(
        num_nodes=num_nodes,
        node_tensorized_data=[0] * num_nodes,
        adjacency_lists=[
            (np.array(src, np.int32), np.array(dst, np.int32)) for src, dst in adj_per_type
        ],
        edge_features=None,
        reference_nodes={k: np.array(v, np.int32) for k, v in (refs or {}).items()},
    )


PAD = BatchPadding(max_nodes=16, max_edge_slots=64, max_graphs=4, edge_tile=8,
                   reference_budgets=(("cands", 8),))


def test_flattening_offsets_and_type_blocking():
    b = GraphBatcher(num_fwd_edge_types=2, padding=PAD,
                     introduce_backwards_edges=True, add_self_edges=True)
    mb = b.initialize()
    g1 = make_graph(3, [([0, 1], [1, 2]), ([], [])], refs={"cands": [0, 2]})
    g2 = make_graph(4, [([0], [3]), ([1, 2], [0, 0])], refs={"cands": [1]})
    assert b.can_add(g1, mb)
    b.extend(g1, mb)
    assert b.can_add(g2, mb)
    b.extend(g2, mb)
    batch = b.finalize(mb, node_data={}, reference_names=["cands"])

    # 2 fwd + 2 bwd + 1 self = 5 types
    assert b.num_edge_types == 5
    assert int(batch.num_nodes) == 7
    assert int(batch.num_graphs) == 2
    # type 0 edges: g1 (0->1, 1->2), g2 offset 3 (3->6)
    adj = batch.adjacency
    t0 = np.where((adj.edge_types == 0) & adj.mask)[0]
    np.testing.assert_array_equal(adj.senders[t0], [0, 1, 3])
    np.testing.assert_array_equal(adj.receivers[t0], [1, 2, 6])
    # type 1 edges: only g2 (1->0, 2->0) offset 3 -> (4->3, 5->3)
    t1 = np.where((adj.edge_types == 1) & adj.mask)[0]
    np.testing.assert_array_equal(adj.senders[t1], [4, 5])
    np.testing.assert_array_equal(adj.receivers[t1], [3, 3])
    # backwards of type 0 has type id 2 and swapped ends
    t2 = np.where((adj.edge_types == 2) & adj.mask)[0]
    np.testing.assert_array_equal(adj.senders[t2], [1, 2, 6])
    np.testing.assert_array_equal(adj.receivers[t2], [0, 1, 3])
    # self edges: last type, only for real nodes
    t4 = np.where((adj.edge_types == 4) & adj.mask)[0]
    assert len(t4) == 7
    np.testing.assert_array_equal(adj.senders[t4], adj.receivers[t4])
    # every tile is type-pure
    tile = adj.edge_tile
    for i, tt in enumerate(adj.tile_types):
        in_tile = adj.edge_types[i * tile : (i + 1) * tile][adj.mask[i * tile : (i + 1) * tile]]
        assert all(t == tt for t in in_tile)
    # padding receivers are out of range
    assert (adj.receivers[~adj.mask] == PAD.max_nodes).all()
    # edge count: (3+2)*2 + 7 self
    assert int(batch.num_edges) == 17

    # node -> graph map
    np.testing.assert_array_equal(batch.node_graph[:7], [0, 0, 0, 1, 1, 1, 1])
    assert (batch.node_graph[7:] == PAD.max_graphs).all()
    # references flattened with offsets
    ref = batch.references["cands"]
    np.testing.assert_array_equal(ref.node_ids[:3], [0, 2, 4])
    np.testing.assert_array_equal(ref.graph_ids[:3], [0, 0, 1])
    assert ref.mask[:3].all() and not ref.mask[3:].any()


def test_budget_refusal():
    b = GraphBatcher(2, PAD, introduce_backwards_edges=False, add_self_edges=False)
    mb = b.initialize()
    big = make_graph(10, [(list(range(9)), list(range(1, 10))), ([], [])])
    assert b.can_add(big, mb)
    b.extend(big, mb)
    # another 10-node graph exceeds max_nodes=16
    assert not b.can_add(big, mb)
    small = make_graph(6, [([], []), ([], [])])
    assert b.can_add(small, mb)


def test_edge_slot_budget_accounts_tile_rounding():
    pad = BatchPadding(max_nodes=64, max_edge_slots=16, max_graphs=8, edge_tile=8)
    b = GraphBatcher(2, pad, introduce_backwards_edges=False, add_self_edges=False)
    mb = b.initialize()
    # 5 edges of each type -> ceil(5/8)*8 * 2 = 16 slots: fits exactly
    g = make_graph(6, [([0] * 5, [1] * 5), ([2] * 5, [3] * 5)])
    assert b.can_add(g, mb)
    b.extend(g, mb)
    # 3 more edges still fit inside the type-0 tile (8 slots)...
    g2 = make_graph(2, [([0] * 3, [1] * 3), ([], [])])
    assert b.can_add(g2, mb)
    b.extend(g2, mb)
    # ...but the 9th type-0 edge needs a new tile: 16 + 8 > 16
    g3 = make_graph(2, [([0], [1]), ([], [])])
    assert not b.can_add(g3, mb)


def test_reference_budget_refusal():
    b = GraphBatcher(1, PAD, False, False)
    mb = b.initialize()
    g = make_graph(2, [([], [])], refs={"cands": list(range(2)) * 3})  # 6 refs
    assert b.can_add(g, mb)
    b.extend(g, mb)
    assert not b.can_add(g, mb)  # 12 > 8 budget


def test_layout_invariants_fuzz():
    """Randomized batches must satisfy every invariant the kernels and the
    scatter-free fused backward rely on:

    1. tiles are pure in edge type and row block; receivers sorted in-tile;
    2. the real slots carry exactly the expected multiset of edges
       (forward + backward type T+t + self edges with the final type id);
    3. agg_counts equals the per-node in-degree of real edges;
    4. transpose pairing: walking slot e' via its own endpoints and
       tile_types_transposed recovers a real slot of the pair edge, and
       pair ids (edge_feature_slot) match — the contract of
       ops/fused_mp.route_transpose;
    5. supertile fields, when present, group whole row-block runs.
    """
    from collections import Counter

    from ptgnn_tpu.graph.batching import GraphBatcher
    from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData

    rng = np.random.RandomState(42)
    for trial in range(10):
        T = int(rng.randint(1, 4))
        tile = int(rng.choice([16, 32]))
        pad = BatchPadding(
            max_nodes=256, max_edge_slots=4096, max_graphs=5,
            edge_tile=tile, agg_rows=int(rng.choice([32, 64])),
            agg_sum_tile=int(rng.choice([0, 4 * tile])),
        )
        b = GraphBatcher(T, pad, True, True, track_edge_features=True)
        mb = b.initialize()
        expected = Counter()  # (src, dst, type) with batch offsets
        offset = 0
        for _ in range(int(rng.randint(1, 4))):
            n = int(rng.randint(4, 60))
            adj, feats = [], []
            for t in range(T):
                e = int(rng.randint(0, 30))  # may be 0: empty type
                src = rng.randint(0, n, e).astype(np.int32)
                dst = rng.randint(0, n, e).astype(np.int32)
                adj.append((src, dst))
                feats.append(rng.randn(e, 3).astype(np.float32))
            # the tensorized contract (graph/gnn.py tensorize): ONE flat
            # feature entry per forward edge, in canonical type order
            feats_flat = [row for f in feats for row in f]
            g = TensorizedGraphData(
                num_nodes=n, node_tensorized_data=[0] * n,
                adjacency_lists=adj, edge_features=feats_flat, reference_nodes={},
            )
            if not b.can_add(g, mb):
                break
            b.extend(g, mb)
            for t, (src, dst) in enumerate(adj):
                for s, d in zip(src, dst):
                    expected[(offset + int(s), offset + int(d), t)] += 1
                    expected[(offset + int(d), offset + int(s), T + t)] += 1
            for v in range(n):  # self edges, final type id
                expected[(offset + v, offset + v, 2 * T)] += 1
            offset += n
        batch = b.finalize(mb, node_data={}, reference_names=[])
        a = batch.adjacency
        senders = np.asarray(a.senders); receivers = np.asarray(a.receivers)
        types = np.asarray(a.edge_types); mask = np.asarray(a.mask)
        tile_types = np.asarray(a.tile_types)
        n_tiles = len(tile_types)

        # 1. purity + sortedness
        et = types.reshape(n_tiles, tile)
        np.testing.assert_array_equal(et, np.repeat(et[:, :1], tile, axis=1))
        rb = np.asarray(a.tile_row_blocks)
        assert (np.diff(rb) >= 0).all()
        recv_t = receivers.reshape(n_tiles, tile)
        mask_t = mask.reshape(n_tiles, tile)
        for k in range(n_tiles):
            rr = recv_t[k][mask_t[k]]
            assert (np.diff(rr) >= 0).all(), f"tile {k} not receiver-sorted"
            if mask_t[k].any():
                blocks = rr // pad.agg_rows
                assert (blocks == rb[k]).all(), f"tile {k} spans row blocks"

        # 2. exact edge multiset
        got = Counter(
            (int(s), int(d), int(t))
            for s, d, t, m in zip(senders, receivers, types, mask) if m
        )
        assert got == expected

        # 3. in-degree
        counts = np.asarray(a.agg_counts).reshape(-1)
        indeg = np.zeros(len(counts), np.int64)
        for (_, d, _), c in expected.items():
            indeg[d] += c
        np.testing.assert_array_equal(counts, indeg)

        # 4. transpose pairing (fused-backward contract)
        pair = np.asarray(a.edge_feature_slot)
        tau = np.repeat(np.asarray(a.tile_types_transposed), tile)
        by_key = {}
        for i in np.nonzero(mask)[0]:
            by_key.setdefault(
                (int(senders[i]), int(receivers[i]), int(types[i])), []
            ).append(i)
        for i in np.nonzero(mask)[0]:
            want = (int(receivers[i]), int(senders[i]), int(tau[i]))
            partners = by_key.get(want, [])
            assert partners, f"slot {i}: no transpose partner {want}"
            assert any(pair[j] == pair[i] for j in partners), (
                f"slot {i}: no partner shares pair id {pair[i]}"
            )

        # 5. supertiles group whole row-block runs
        if a.super_tile_row_blocks is not None:
            k = pad.agg_sum_tile // tile
            grouped = rb.reshape(-1, k)
            np.testing.assert_array_equal(
                grouped, np.repeat(grouped[:, :1], k, axis=1)
            )


def test_att_order_worst_case_seal_overrun():
    """Regression: alternating 1-node and (att_block+1)-node graphs force a
    pre-seal AND a post-seal around every big graph (~3x slot usage), which
    overran the old 2*max_nodes att_order buffer with a numpy broadcast
    ValueError at finalize."""
    block = 8
    max_nodes = 128
    pad = BatchPadding(
        max_nodes=max_nodes, max_edge_slots=4096, max_graphs=32,
        edge_tile=32, agg_rows=32, att_block=block,
    )
    b = GraphBatcher(1, pad, introduce_backwards_edges=False, add_self_edges=False)
    mb = b.initialize()
    sizes = []
    toggle = True
    while True:
        n = 1 if toggle else block + 1
        toggle = not toggle
        src = np.zeros(max(n - 1, 1), np.int32)
        g = TensorizedGraphData(
            num_nodes=n, node_tensorized_data=[0] * n,
            adjacency_lists=[(src, src)], edge_features=None,
            reference_nodes={},
        )
        if not b.can_add(g, mb):
            break
        b.extend(g, mb)
        sizes.append(n)
    assert len(sizes) >= 8, "packing setup failed to admit the adversarial mix"
    batch = b.finalize(mb, node_data={}, reference_names=[])  # must not raise
    order = np.asarray(batch.att_order)
    flat = order.reshape(-1)
    total = sum(sizes)
    real = flat[flat < total]
    assert sorted(real.tolist()) == list(range(total))
    # every graph <= block sits inside exactly one block
    offset = 0
    for n in sizes:
        if n <= block:
            rows = {
                int(np.where(flat == node)[0][0]) // block
                for node in range(offset, offset + n)
            }
            assert len(rows) == 1
        offset += n
