"""C++ batch assembler vs the Python fallback: identical batches."""
import numpy as np
import pytest

from ptgnn_tpu import native
from ptgnn_tpu.graph.batching import GraphBatcher
from ptgnn_tpu.graph.structs import BatchPadding, TensorizedGraphData


def build(monkeypatch, disable_native, track_edge_features=False):
    if disable_native:
        monkeypatch.setattr(native, "get_assembler", lambda: None)
    rng = np.random.RandomState(7)
    pad = BatchPadding(max_nodes=128, max_edge_slots=8192, max_graphs=4,
                       edge_tile=32, agg_rows=32)
    b = GraphBatcher(3, pad, introduce_backwards_edges=True, add_self_edges=True,
                     track_edge_features=track_edge_features)
    mb = b.initialize()
    for n in (40, 35, 30):
        adj = [
            (rng.randint(0, n, 25).astype(np.int32), rng.randint(0, n, 25).astype(np.int32))
            for _ in range(3)
        ]
        # feature-tracking batches number slots only for graphs that CARRY
        # features (one flat entry per forward edge, the gnn.py contract)
        feats = [np.zeros(2, np.float32)] * (3 * 25) if track_edge_features else None
        g = TensorizedGraphData(num_nodes=n, node_tensorized_data=[0] * n,
                                adjacency_lists=adj, edge_features=feats,
                                reference_nodes={"refs": np.arange(3, dtype=np.int32)})
        assert b.can_add(g, mb)
        b.extend(g, mb)
    return b.finalize(mb, node_data={}, reference_names=["refs"])


def test_native_assembler_matches_python(monkeypatch):
    if native.get_assembler() is None:
        pytest.skip("native assembler unavailable")
    fast = build(monkeypatch, disable_native=False)
    with monkeypatch.context() as m:
        ref = build(m, disable_native=True)
    for field in ("senders", "receivers", "edge_types", "tile_types",
                  "mask", "local_rows", "tile_row_blocks", "agg_counts",
                  "tile_types_transposed", "super_tile_row_blocks",
                  "edge_feature_slot"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast.adjacency, field)),
            np.asarray(getattr(ref.adjacency, field)),
            err_msg=field,
        )
    np.testing.assert_array_equal(fast.node_graph, ref.node_graph)
    assert int(fast.num_edges) == int(ref.num_edges)


def test_native_assembler_speed_smoke():
    """Native path should assemble a large batch quickly (smoke, not a perf
    assertion beyond an order of magnitude)."""
    if native.get_assembler() is None:
        pytest.skip("native assembler unavailable")
    import time

    rng = np.random.RandomState(0)
    E, N = 400_000, 32768
    senders = rng.randint(0, N, E).astype(np.int32)
    receivers = rng.randint(0, N, E).astype(np.int32)
    types = rng.randint(0, 21, E).astype(np.int32)
    t0 = time.time()
    out = native.assemble_edge_layout(
        senders, receivers, types, max_nodes=N, e_pad=1024 * 1024,
        tile=128, agg_rows=256, num_types=21,
    )
    elapsed = time.time() - t0
    assert out is not None
    assert elapsed < 2.0, f"native assembly too slow: {elapsed:.2f}s"


def test_native_assembler_edge_feature_slots(monkeypatch):
    """The per-slot edge-feature indices (payload column of the C ABI) must
    survive the native layout identically to the Python fallback: forward
    edges carry their feature index, backward edges share it, self edges and
    padding get -1."""
    if native.get_assembler() is None:
        pytest.skip("native assembler unavailable")
    fast = build(monkeypatch, disable_native=False, track_edge_features=True)
    with monkeypatch.context() as m:
        ref = build(m, disable_native=True, track_edge_features=True)
    np.testing.assert_array_equal(
        np.asarray(fast.adjacency.edge_feature_slot),
        np.asarray(ref.adjacency.edge_feature_slot),
    )
    slots = np.asarray(fast.adjacency.edge_feature_slot)
    mask = np.asarray(fast.adjacency.mask)
    types = np.asarray(fast.adjacency.edge_types)
    n_fwd = 3
    # forward+backward real edges have a feature slot; self edges are -1
    fwd_bwd = mask & (types < 2 * n_fwd)
    self_e = mask & (types == 2 * n_fwd)
    assert np.all(slots[fwd_bwd] >= 0)
    assert np.all(slots[self_e] == -1)
    assert np.all(slots[~mask] == -1)
