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
