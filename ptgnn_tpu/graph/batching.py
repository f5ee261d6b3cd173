"""Host-side assembly of statically shaped graph batches in the unified
(block, type)-grouped edge layout.

Implements the reference's graph-flattening minibatcher
(graphneuralnetwork.py:369-493) for XLA/Pallas. Many small graphs become one
padded disconnected graph whose fused edge array is sorted by

    (receiver row block, edge type, receiver)

with every (row block, type) segment padded up to a multiple of
``edge_tile``. One ordering then serves both hot paths with zero device-side
permutation:

* every tile of ``edge_tile`` consecutive edges has a single **type**
  (``tile_types``) -> per-edge-type linear maps are one tile-batched MXU
  matmul (ops/typed_linear.py);
* every tile also targets a single **row block** of ``agg_rows`` consecutive
  receiver rows, with receivers sorted inside each segment
  (``tile_row_blocks``, ``local_rows``) -> message aggregation is the
  sorted-segment Pallas kernel (ops/pallas/segment_kernels.py), one-hot
  matmuls on the MXU instead of XLA's serialized scatter.

Backwards edges (type id T+t) and self edges (last type id) are materialized
here at batch build (the reference builds them per forward pass,
graphneuralnetwork.py:172-186 — device-side list surgery is hostile to XLA).
All work is numpy on host; the hot assembly loop is isolated so it can later
be swapped for the C++ batch assembler without touching callers.
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from ptgnn_tpu.graph.structs import (
    AdjacencyStruct,
    BatchPadding,
    GraphBatch,
    ReferenceSet,
    TensorizedGraphData,
)


def materialized_edge_type_count(
    num_fwd_edge_types: int, *, introduce_backwards_edges: bool, add_self_edges: bool
) -> int:
    """Total materialized edge-type ids: forward types, optionally doubled
    for backwards (ids T+t), plus one trailing self-edge type (the
    reference's ordering, graphneuralnetwork.py:283-290). The single source
    of truth shared by the batcher and the model."""
    t = num_fwd_edge_types
    if introduce_backwards_edges:
        t *= 2
    if add_self_edges:
        t += 1
    return t


def _tile_ceil(n: int, tile: int) -> int:
    return int(math.ceil(n / tile)) * tile


def required_edge_slots(
    seg_counts: Dict[Tuple[int, int], int], *, tile: int, align: int, num_blocks: int
) -> int:
    """Slots the unified layout needs for the given (row block, type) -> edge
    counts: every segment pads to ``tile``, every block's run pads to
    ``align`` (the sum supertile), and empty blocks still get one aligned run
    so their output block initializes."""
    per_block: Dict[int, int] = {}
    for (b, _t), c in seg_counts.items():
        per_block[b] = per_block.get(b, 0) + _tile_ceil(c, tile)
    slots = sum(_tile_ceil(s, align) for s in per_block.values())
    slots += align * (num_blocks - len(per_block))
    return slots


def assemble_layout_arrays(
    senders_r: np.ndarray,
    receivers_r: np.ndarray,
    types_r: np.ndarray,
    feats_r: Optional[np.ndarray],
    *,
    max_nodes: int,
    e_pad: int,
    tile: int,
    agg_rows: int,
    num_types: int,
    align: int,
    sender_domain: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Assemble raw edge arrays into the unified (row block, type, receiver)
    layout. Tries the C++ assembler, falls back to numpy. Returns
    (senders, receivers, edge_types, local_rows, edge_mask, tile_types,
    tile_row_blocks, counts [num_blocks, agg_rows], feature_slot), or None if
    the edges exceed the ``e_pad`` budget.

    ``sender_domain`` bounds the sender ids (they are copied through, not
    used for the layout); defaults to ``max_nodes``. Node-sharded boundary
    layouts (parallel/node_sharding.py) pass a recv-buffer domain here.
    """
    from ptgnn_tpu import native as native_mod

    if feats_r is None:
        feats_r = np.full(len(senders_r), -1, np.int32)
    native_result = native_mod.assemble_edge_layout(
        senders_r, receivers_r, types_r, feats_r,
        max_nodes=max_nodes, e_pad=e_pad, tile=tile, agg_rows=agg_rows,
        num_types=num_types, align=align, sender_domain=sender_domain,
    )
    if native_result is not None:
        return native_result
    if native_mod.get_assembler() is not None:
        # the native assembler was available and reported budget overflow
        if required_edge_slots(
            _seg_counts_of(receivers_r, types_r, agg_rows, num_types),
            tile=tile, align=align, num_blocks=-(-max_nodes // agg_rows),
        ) > e_pad:
            return None
    return _assemble_layout_python(
        senders_r, receivers_r, types_r, feats_r,
        max_nodes=max_nodes, e_pad=e_pad, tile=tile, agg_rows=agg_rows,
        num_types=num_types, align=align,
    )


def build_adjacency_struct(
    layout_arrays: Tuple[np.ndarray, ...],
    *,
    tile: int,
    align: int,
    num_fwd_types: int,
    introduce_backwards_edges: bool,
) -> AdjacencyStruct:
    """Wrap assembled layout arrays (the ``assemble_layout_arrays`` tuple)
    into an AdjacencyStruct with the derived plan fields: transpose tile-type
    map, supertile view, and sublane-replicated row indices."""
    (senders, receivers, edge_types, local_rows, edge_mask, tile_types,
     tile_row_blocks, counts, feature_slot) = layout_arrays
    e_pad = senders.shape[0]
    n_tiles = e_pad // tile

    # Transpose type map: fwd type t <-> backward type T+t, self -> self.
    # Lets gradients re-derive sender-side scatters as receiver-keyed
    # aggregations over the materialized transpose edges (ops/fused_mp.py).
    tile_types_transposed = None
    if introduce_backwards_edges:
        base = num_fwd_types
        tt = tile_types
        tile_types_transposed = np.where(
            tt < base, tt + base, np.where(tt < 2 * base, tt - base, tt)
        ).astype(np.int32)

    # Supertile view for the sum kernel: valid when every group of
    # agg_sum_tile/edge_tile consecutive tiles shares one row block
    # (guaranteed by the aligned python layout; the check keeps the
    # native assembler path honest too).
    super_tile_row_blocks = None
    if align > tile:
        k = align // tile
        grouped = tile_row_blocks.reshape(n_tiles // k, k)
        if bool(np.all(grouped == grouped[:, :1])):
            super_tile_row_blocks = np.ascontiguousarray(grouped[:, 0])

    # The kernels' 8x sublane-replicated row operands (local_rows_row[_super])
    # are pure replications of local_rows — at 8x the edge count each they
    # are 2/3 of a batch's host->device bytes. Deriving them on device
    # (ops/pallas/segment_kernels.py:rows_row_operand) is interpreter-exact
    # but feeding Pallas a computed operand HANGS Mosaic on the current v5e
    # toolchain (reproduced 2026-08-17 and again 2026-08-20 under the
    # one-attempt protocol; see ROUND_NOTES.md). Host-build remains the
    # default; PTGNN_TPU_DERIVE_ROWS=1 ships only local_rows and lets the
    # kernels derive — retry it the session the toolchain moves.
    if os.environ.get("PTGNN_TPU_DERIVE_ROWS"):
        rows_row = lambda granularity: None  # noqa: E731 - gated derive mode
    else:
        def rows_row(granularity: int):
            # shared with the plan builder so the sublane layout can't drift
            from ptgnn_tpu.ops.pallas.segment_kernels import replicate_rows_sublanes

            return replicate_rows_sublanes(local_rows, granularity)

    return AdjacencyStruct(
        senders=senders,
        receivers=receivers,
        edge_types=edge_types,
        tile_types=tile_types,
        mask=edge_mask,
        tile_types_transposed=tile_types_transposed,
        local_rows=local_rows.reshape(e_pad, 1),
        local_rows_row=rows_row(tile),
        local_rows_row_super=(
            rows_row(align) if super_tile_row_blocks is not None else None
        ),
        tile_row_blocks=tile_row_blocks,
        agg_counts=counts,
        super_tile_row_blocks=super_tile_row_blocks,
        edge_feature_slot=feature_slot,
    )


def _seg_counts_of(
    receivers: np.ndarray, types: np.ndarray, agg_rows: int, num_types: int
) -> Dict[Tuple[int, int], int]:
    delta: Dict[Tuple[int, int], int] = {}
    if len(receivers):
        keys = (receivers // agg_rows).astype(np.int64) * (num_types + 1) + types
        uniq, cnt = np.unique(keys, return_counts=True)
        for k, c in zip(uniq, cnt):
            b, t = divmod(int(k), num_types + 1)
            delta[(b, t)] = int(c)
    return delta


def _assemble_layout_python(
    senders_r, receivers_r, types_r, feats_r, *,
    max_nodes, e_pad, tile, agg_rows, num_types, align,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Numpy oracle for the unified layout (mirrors the C++ assembler)."""
    r = agg_rows
    n_pad = max_nodes
    n_tiles = e_pad // tile
    num_blocks = -(-max_nodes // agg_rows)
    t_total = num_types

    # Sort by (row block, type, receiver).
    block_r = receivers_r // r
    order = np.lexsort((receivers_r, types_r, block_r))
    senders_r = senders_r[order]
    receivers_r = receivers_r[order]
    types_r = types_r[order]
    feats_r = feats_r[order]
    block_r = block_r[order]

    # Segment boundaries where (block, type) changes.
    seg_key = block_r.astype(np.int64) * (t_total + 1) + types_r
    if len(seg_key):
        seg_bounds = np.concatenate(
            [[0], np.nonzero(np.diff(seg_key))[0] + 1, [len(seg_key)]]
        )
    else:
        seg_bounds = np.array([0, 0])

    senders = np.zeros(e_pad, np.int32)
    receivers = np.full(e_pad, n_pad, np.int32)  # OOB -> dropped
    edge_types = np.zeros(e_pad, np.int32)
    tile_types = np.zeros(n_tiles, np.int32)
    tile_row_blocks = np.zeros(n_tiles, np.int32)
    local_rows = np.full(e_pad, r, np.int32)  # sentinel R
    edge_mask = np.zeros(e_pad, bool)
    feature_slot = np.full(e_pad, -1, np.int32)

    cursor = 0
    tile_cursor = 0
    seg_idx = 0
    num_segments = len(seg_bounds) - 1
    for b in range(num_blocks):
        block_start = cursor
        while seg_idx < num_segments:
            s0, s1 = seg_bounds[seg_idx], seg_bounds[seg_idx + 1]
            if s1 <= s0 or block_r[s0] != b:
                if s1 <= s0:
                    seg_idx += 1
                    continue
                break
            c = s1 - s0
            seg = _tile_ceil(c, tile)
            t = int(types_r[s0])
            if cursor + seg > e_pad:
                return None  # budget exceeded
            senders[cursor : cursor + c] = senders_r[s0:s1]
            receivers[cursor : cursor + c] = receivers_r[s0:s1]
            feature_slot[cursor : cursor + c] = feats_r[s0:s1]
            local_rows[cursor : cursor + c] = receivers_r[s0:s1] - b * r
            edge_types[cursor : cursor + seg] = t
            edge_mask[cursor : cursor + c] = True
            tile_types[tile_cursor : tile_cursor + seg // tile] = t
            tile_row_blocks[tile_cursor : tile_cursor + seg // tile] = b
            cursor += seg
            tile_cursor += seg // tile
            seg_idx += 1
        # Pad the block's run to the supertile alignment with all-padding
        # tiles mapped to this block. Empty blocks get one full aligned
        # run so their output block still initializes.
        target = block_start + _tile_ceil(max(cursor - block_start, 1), align or tile)
        if target > e_pad:
            return None
        pad_tiles = (target - cursor) // tile
        tile_row_blocks[tile_cursor : tile_cursor + pad_tiles] = b
        cursor = target
        tile_cursor += pad_tiles
    # Trailing spare tiles continue the last row block (all padding).
    if tile_cursor < n_tiles:
        tile_row_blocks[tile_cursor:] = num_blocks - 1

    counts = np.zeros(num_blocks * r, np.int32)
    if len(receivers_r):
        np.add.at(counts, receivers_r, 1)

    return (
        senders, receivers, edge_types, local_rows, edge_mask, tile_types,
        tile_row_blocks, counts.reshape(num_blocks, r), feature_slot,
    )


class GraphBatcher:
    """Accumulates TensorizedGraphData into one statically shaped GraphBatch.

    ``num_fwd_edge_types`` is the canonical (metadata-ordered) type count;
    backwards types get ids T+t and self edges the final id, matching the
    reference's ordering (graphneuralnetwork.py:172-186, 283-290).
    """

    def __init__(
        self,
        num_fwd_edge_types: int,
        padding: BatchPadding,
        introduce_backwards_edges: bool,
        add_self_edges: bool,
        track_edge_features: bool = False,
    ):
        self.num_fwd_edge_types = num_fwd_edge_types
        self.padding = padding
        self.introduce_backwards_edges = introduce_backwards_edges
        self.add_self_edges = add_self_edges
        self.track_edge_features = track_edge_features
        assert padding.max_edge_slots % padding.edge_tile == 0

    @property
    def _block_align(self) -> int:
        """Slot alignment of each row block's run (the sum supertile).
        Falls back to edge_tile when agg_sum_tile is off or incompatible
        with the configured tile/budget (then sum runs at edge_tile)."""
        s = self.padding.agg_sum_tile
        if (
            s
            and s % self.padding.edge_tile == 0
            and self.padding.max_edge_slots % s == 0
        ):
            return s
        return self.padding.edge_tile

    @property
    def num_edge_types(self) -> int:
        return materialized_edge_type_count(
            self.num_fwd_edge_types,
            introduce_backwards_edges=self.introduce_backwards_edges,
            add_self_edges=self.add_self_edges,
        )

    @property
    def num_row_blocks(self) -> int:
        return -(-self.padding.max_nodes // self.padding.agg_rows)

    # -- accumulation ----------------------------------------------------
    def initialize(self) -> Dict[str, Any]:
        return {
            # raw per-graph edge arrays (already offset), concatenated lazily
            "senders": [],
            "receivers": [],
            "types": [],
            # (row_block, type) -> edge count, for exact slot accounting
            "seg_counts": {},
            "num_nodes_per_graph": [],
            "reference_node_ids": {},
            "reference_node_graph_idx": {},
            "num_nodes_in_mb": 0,
            "num_edges_in_mb": 0,
            "feature_idx": [],
            "num_features_in_mb": 0,
        }

    def _graph_edge_arrays(
        self,
        graph: TensorizedGraphData,
        offset: int,
        feature_offset: int = 0,
        with_features: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """All materialized edges of one graph (fwd + bwd + self), offset.

        The fourth array maps each edge to its index in the flattened
        per-graph forward-edge feature list (backward edges share the forward
        edge's index, self edges get -1; reference:
        graphneuralnetwork.py:172-183). ``with_features=False`` marks every
        edge -1 — used for graphs WITHOUT edge features so their edges never
        alias another graph's feature rows.

        In batches that track no features at all the indices double as pure
        fwd/bwd PAIR ids (consumed by ops/fused_mp.py's argmax routing),
        numbered by the same cursor; nothing ever gathers feature rows with
        them."""
        senders: List[np.ndarray] = []
        receivers: List[np.ndarray] = []
        types: List[np.ndarray] = []
        feats: List[np.ndarray] = []
        base = self.num_fwd_edge_types
        fcursor = feature_offset
        for t, (src, dst) in enumerate(graph.adjacency_lists):
            if len(src) == 0:
                continue
            src = src.astype(np.int32) + offset
            dst = dst.astype(np.int32) + offset
            if with_features:
                fidx = np.arange(fcursor, fcursor + len(src), dtype=np.int32)
                fcursor += len(src)
            else:
                fidx = np.full(len(src), -1, np.int32)
            senders.append(src)
            receivers.append(dst)
            types.append(np.full(len(src), t, np.int32))
            feats.append(fidx)
            if self.introduce_backwards_edges:
                senders.append(dst)
                receivers.append(src)
                types.append(np.full(len(src), base + t, np.int32))
                feats.append(fidx)
        if self.add_self_edges:
            idents = np.arange(offset, offset + graph.num_nodes, dtype=np.int32)
            senders.append(idents)
            receivers.append(idents)
            types.append(np.full(graph.num_nodes, self.num_edge_types - 1, np.int32))
            feats.append(np.full(graph.num_nodes, -1, np.int32))
        if not senders:
            z = np.zeros(0, np.int32)
            return z, z, z, z
        return (
            np.concatenate(senders),
            np.concatenate(receivers),
            np.concatenate(types),
            np.concatenate(feats),
        )

    def _slots_for(self, seg_counts: Dict[Tuple[int, int], int]) -> int:
        return required_edge_slots(
            seg_counts,
            tile=self.padding.edge_tile,
            align=self._block_align,
            num_blocks=self.num_row_blocks,
        )

    def _merged_seg_counts(self, graph, offset) -> Dict[Tuple[int, int], int]:
        # can_add -> extend call this back-to-back for the same (graph,
        # offset); materializing + sorting the full edge set three times per
        # admitted graph made batch assembly the host bottleneck. Memoize
        # the last result (holding the graph object pins its id).
        memo = getattr(self, "_seg_counts_memo", None)
        if memo is not None and memo[0] is graph and memo[1] == offset:
            return memo[2]
        _, receivers, types, _ = self._graph_edge_arrays(graph, offset)
        r = self.padding.agg_rows
        delta: Dict[Tuple[int, int], int] = {}
        if len(receivers):
            keys = (receivers // r).astype(np.int64) * (self.num_edge_types + 1) + types
            uniq, cnt = np.unique(keys, return_counts=True)
            for k, c in zip(uniq, cnt):
                b, t = divmod(int(k), self.num_edge_types + 1)
                delta[(b, t)] = int(c)
        self._seg_counts_memo = (graph, offset, delta)
        return delta

    def can_add(self, graph: TensorizedGraphData, mb: Dict[str, Any]) -> bool:
        p = self.padding
        if len(mb["num_nodes_per_graph"]) + 1 > p.max_graphs:
            return False
        offset = mb["num_nodes_in_mb"]
        if offset + graph.num_nodes > p.max_nodes:
            return False
        merged = dict(mb["seg_counts"])
        for key, c in self._merged_seg_counts(graph, offset).items():
            merged[key] = merged.get(key, 0) + c
        if self._slots_for(merged) > p.max_edge_slots:
            return False
        for name, refs in graph.reference_nodes.items():
            existing = mb["reference_node_ids"].get(name)
            count = sum(len(a) for a in existing) if existing else 0
            if count + len(refs) > p.reference_budget(name):
                return False
        return True

    def extend(self, graph: TensorizedGraphData, mb: Dict[str, Any]) -> bool:
        """Add a graph (caller must have checked can_add)."""
        offset = mb["num_nodes_in_mb"]
        graph_idx = len(mb["num_nodes_per_graph"])
        # Feature numbering must mirror GraphNeuralNetworkModel's minibatch
        # (gnn.py extends edge_data_mb ONLY for graphs carrying features):
        # a featureless graph in a feature-tracking batch gets -1 slots and
        # does NOT advance the cursor, otherwise every later graph's edges
        # would gather ANOTHER graph's feature rows. Fully featureless
        # batches still number the slots (unique fwd/bwd pair ids for the
        # fused argmax routing) — no feature data exists to alias.
        has_features = self.track_edge_features and graph.edge_features is not None
        number_slots = has_features or not self.track_edge_features
        if has_features:
            assert len(graph.edge_features) == graph.num_edges, (
                f"graph has {graph.num_edges} forward edges but "
                f"{len(graph.edge_features)} edge features — the flattened "
                "feature list must hold exactly one entry per forward edge "
                "in canonical type order"
            )
        senders, receivers, types, feat_idx = self._graph_edge_arrays(
            graph, offset, mb["num_features_in_mb"], with_features=number_slots
        )
        mb["senders"].append(senders)
        mb["receivers"].append(receivers)
        mb["types"].append(types)
        mb["feature_idx"].append(feat_idx)
        if number_slots:
            mb["num_features_in_mb"] += graph.num_edges
        for key, c in self._merged_seg_counts(graph, offset).items():
            mb["seg_counts"][key] = mb["seg_counts"].get(key, 0) + c
        mb["num_edges_in_mb"] += len(senders)

        for name, refs in graph.reference_nodes.items():
            mb["reference_node_ids"].setdefault(name, []).append(
                refs.astype(np.int32) + offset
            )
            mb["reference_node_graph_idx"].setdefault(name, []).extend(
                graph_idx for _ in range(len(refs))
            )
        mb["num_nodes_per_graph"].append(graph.num_nodes)
        mb["num_nodes_in_mb"] = offset + graph.num_nodes
        return mb["num_nodes_in_mb"] < self.padding.max_nodes

    # -- finalization ----------------------------------------------------
    def finalize(
        self, mb: Dict[str, Any], node_data: Any, reference_names: Sequence[str]
    ) -> GraphBatch:
        p = self.padding
        tile = p.edge_tile
        r = p.agg_rows
        n_pad, g_pad = p.max_nodes, p.max_graphs
        e_pad = p.max_edge_slots
        n_tiles = e_pad // tile
        num_blocks = self.num_row_blocks
        num_nodes = mb["num_nodes_in_mb"]
        num_graphs = len(mb["num_nodes_per_graph"])
        t_total = self.num_edge_types

        if mb["senders"]:
            senders_r = np.concatenate(mb["senders"])
            receivers_r = np.concatenate(mb["receivers"])
            types_r = np.concatenate(mb["types"])
            feats_r = np.concatenate(mb["feature_idx"])
        else:
            senders_r = receivers_r = types_r = feats_r = np.zeros(0, np.int32)

        result = assemble_layout_arrays(
            senders_r, receivers_r, types_r, feats_r,
            max_nodes=n_pad, e_pad=e_pad, tile=tile, agg_rows=r,
            num_types=t_total, align=self._block_align,
        )
        assert result is not None, "batcher admitted more edges than the budget"
        (senders, receivers, edge_types, local_rows, edge_mask,
         tile_types, tile_row_blocks, counts, feature_slot) = result
        return self._build_graph_batch(
            mb, node_data, reference_names,
            senders=senders, receivers=receivers, edge_types=edge_types,
            local_rows=local_rows, edge_mask=edge_mask, tile_types=tile_types,
            tile_row_blocks=tile_row_blocks, counts=counts,
            feature_slot=feature_slot,
        )

    def _build_graph_batch(
        self, mb, node_data, reference_names, *, senders, receivers, edge_types,
        local_rows, edge_mask, tile_types, tile_row_blocks, counts,
        feature_slot=None,
    ) -> GraphBatch:
        p = self.padding
        n_pad, g_pad = p.max_nodes, p.max_graphs
        num_nodes = mb["num_nodes_in_mb"]
        num_graphs = len(mb["num_nodes_per_graph"])

        adjacency = build_adjacency_struct(
            (senders, receivers, edge_types, local_rows, edge_mask, tile_types,
             tile_row_blocks, counts, feature_slot),
            tile=p.edge_tile,
            align=self._block_align,
            num_fwd_types=self.num_fwd_edge_types,
            introduce_backwards_edges=self.introduce_backwards_edges,
        )

        # ---- node -> graph mapping ----
        node_graph = np.full(n_pad, g_pad, np.int32)
        start = 0
        for i, n in enumerate(mb["num_nodes_per_graph"]):
            node_graph[start : start + n] = i
            start += n
        node_mask = np.arange(n_pad) < num_nodes
        graph_mask = np.arange(g_pad) < num_graphs

        # ---- padded reference sets ----
        references: Dict[str, ReferenceSet] = {}
        for name in reference_names:
            budget = p.reference_budget(name)
            ids = np.zeros(budget, np.int32)
            gidx = np.full(budget, g_pad, np.int32)
            mask = np.zeros(budget, bool)
            chunks = mb["reference_node_ids"].get(name, [])
            if chunks:
                flat = np.concatenate(chunks)
                gflat = np.asarray(mb["reference_node_graph_idx"][name], np.int32)
                nrefs = len(flat)
                ids[:nrefs] = flat
                gidx[:nrefs] = gflat
                mask[:nrefs] = True
            references[name] = ReferenceSet(node_ids=ids, graph_ids=gidx, mask=mask)

        return GraphBatch(
            node_data=node_data,
            adjacency=adjacency,
            edge_feature_data=None,
            node_graph=node_graph,
            node_mask=node_mask,
            references=references,
            num_nodes=np.int32(num_nodes),
            num_edges=np.int32(mb["num_edges_in_mb"]),
            num_graphs=np.int32(num_graphs),
            graph_mask=graph_mask,
            att_order=self._build_att_order(mb["num_nodes_per_graph"]),
        )

    def _build_att_order(self, num_nodes_per_graph) -> "np.ndarray | None":
        """[n_blocks, att_block] node permutation: Next-Fit bin packing of
        graphs into attention blocks, so no graph <= att_block straddles a
        block boundary (making block attention exact for it — the
        reference's chunk-aligned-to-graph semantics,
        selfattmessagepassing.py:59-75). Graphs larger than a block are
        chunked across consecutive blocks, like the reference.

        The static budget is the exact worst case, not the Next-Fit <2x
        folklore (which the double seal around a just-over-block graph
        breaks): each graph costs at most a pre-seal (block-1) plus
        ceil(n/block)*block <= n + block-1, so the total is bounded by both
        n_pad + 2*(block-1)*max_graphs and (pairing each pre-seal with the
        >=1 real node that forced it) 3*n_pad."""
        block = self.padding.att_block
        if not block:
            return None
        n_pad = self.padding.max_nodes
        worst = min(n_pad + 2 * block * self.padding.max_graphs, 3 * n_pad)
        n_blocks = -(-worst // block) + 1
        order = np.full(n_blocks * block, n_pad, np.int32)
        cursor = 0  # next free slot in the flat order array
        offset = 0  # node id of the current graph's first node
        for n in num_nodes_per_graph:
            remaining = block - cursor % block
            if n > remaining and remaining < block:
                # Seal the partial block: small graphs must fit whole in one
                # block, and big graphs must START block-aligned so their
                # chunks are full `block`-wide windows (the reference chunks
                # each graph from its own start, selfattmessagepassing.py:59).
                cursor += remaining
            order[cursor : cursor + n] = np.arange(offset, offset + n, dtype=np.int32)
            cursor += n
            if n > block and cursor % block:
                cursor += block - cursor % block  # big graphs end their block
            offset += n
        assert cursor <= len(order)
        return order.reshape(n_blocks, block)
