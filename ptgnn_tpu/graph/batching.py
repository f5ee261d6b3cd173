"""Host-side assembly of statically shaped, type-blocked graph batches.

Implements the reference's graph-flattening minibatcher
(graphneuralnetwork.py:369-493) for XLA: many small graphs become one padded
disconnected graph with fixed array shapes (see graph/structs.py docstring
for the layout). All work here is numpy on host; the heavy loop (offset
shifting + concat + tile padding) is isolated so it can later be swapped for
the C++ batch assembler without touching callers.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ptgnn_tpu.graph.structs import (
    AdjacencyStruct,
    BatchPadding,
    GraphBatch,
    ReferenceSet,
    TensorizedGraphData,
)


def _tile_ceil(n: int, tile: int) -> int:
    return int(math.ceil(n / tile)) * tile


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
    ):
        self.num_fwd_edge_types = num_fwd_edge_types
        self.padding = padding
        self.introduce_backwards_edges = introduce_backwards_edges
        self.add_self_edges = add_self_edges

    @property
    def num_edge_types(self) -> int:
        t = self.num_fwd_edge_types
        if self.introduce_backwards_edges:
            t *= 2
        if self.add_self_edges:
            t += 1
        return t

    # -- accumulation ----------------------------------------------------
    def initialize(self) -> Dict[str, Any]:
        return {
            "adjacency_lists": [([], []) for _ in range(self.num_fwd_edge_types)],
            "edge_counts": [0] * self.num_fwd_edge_types,
            "num_nodes_per_graph": [],
            "reference_node_ids": {},
            "reference_node_graph_idx": {},
            "num_nodes_in_mb": 0,
        }

    def _edge_slots(self, counts: Sequence[int]) -> int:
        tile = self.padding.edge_tile
        slots = sum(_tile_ceil(c, tile) for c in counts)
        if self.introduce_backwards_edges:
            slots *= 2
        return slots

    def can_add(self, graph: TensorizedGraphData, mb: Dict[str, Any]) -> bool:
        p = self.padding
        if len(mb["num_nodes_per_graph"]) + 1 > p.max_graphs:
            return False
        if mb["num_nodes_in_mb"] + graph.num_nodes > p.max_nodes:
            return False
        new_counts = [
            c + len(src) for c, (src, _) in zip(mb["edge_counts"], graph.adjacency_lists)
        ]
        if self._edge_slots(new_counts) > p.max_edge_slots:
            return False
        for name, refs in graph.reference_nodes.items():
            existing = mb["reference_node_ids"].get(name)
            count = sum(len(a) for a in existing) if existing else 0
            if count + len(refs) > p.reference_budget(name):
                return False
        return True

    def extend(self, graph: TensorizedGraphData, mb: Dict[str, Any]) -> bool:
        """Add a graph (caller must have checked can_add). Returns whether
        the batch is likely to accept more (soft signal; can_add decides)."""
        offset = mb["num_nodes_in_mb"]
        graph_idx = len(mb["num_nodes_per_graph"])
        for t, (src, dst) in enumerate(graph.adjacency_lists):
            if len(src):
                mb["adjacency_lists"][t][0].append(src.astype(np.int32) + offset)
                mb["adjacency_lists"][t][1].append(dst.astype(np.int32) + offset)
                mb["edge_counts"][t] += len(src)
        for name, refs in graph.reference_nodes.items():
            mb["reference_node_ids"].setdefault(name, []).append(refs.astype(np.int32) + offset)
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
        n_pad, g_pad = p.max_nodes, p.max_graphs
        num_nodes = mb["num_nodes_in_mb"]
        num_graphs = len(mb["num_nodes_per_graph"])

        # ---- fused type-blocked edge arrays ----
        fwd: List[Tuple[np.ndarray, np.ndarray]] = []
        for t in range(self.num_fwd_edge_types):
            srcs, dsts = mb["adjacency_lists"][t]
            if srcs:
                fwd.append((np.concatenate(srcs), np.concatenate(dsts)))
            else:
                z = np.zeros(0, np.int32)
                fwd.append((z, z))

        segments: List[Tuple[int, np.ndarray, np.ndarray]] = []  # (type, src, dst)
        for t, (src, dst) in enumerate(fwd):
            segments.append((t, src, dst))
        if self.introduce_backwards_edges:
            base = self.num_fwd_edge_types
            for t, (src, dst) in enumerate(fwd):
                segments.append((base + t, dst, src))

        e_slots = p.max_edge_slots
        self_slots = n_pad if self.add_self_edges else 0
        e_pad = e_slots + self_slots
        senders = np.zeros(e_pad, np.int32)
        receivers = np.full(e_pad, n_pad, np.int32)  # OOB -> dropped
        edge_types = np.zeros(e_pad, np.int32)
        tile_types = np.zeros(e_pad // tile, np.int32)
        edge_mask = np.zeros(e_pad, bool)

        cursor = 0
        total_edges = 0
        for t, src, dst in segments:
            c = len(src)
            if c == 0:
                continue
            seg = _tile_ceil(c, tile)
            senders[cursor : cursor + c] = src
            receivers[cursor : cursor + c] = dst
            edge_types[cursor : cursor + seg] = t
            tile_types[cursor // tile : (cursor + seg) // tile] = t
            edge_mask[cursor : cursor + c] = True
            cursor += seg
            total_edges += c
        assert cursor <= e_slots, "batcher admitted more edges than the budget"

        if self.add_self_edges:
            t_self = self.num_edge_types - 1
            idents = np.arange(n_pad, dtype=np.int32)
            senders[e_slots:] = idents
            receivers[e_slots:] = np.where(idents < num_nodes, idents, n_pad)
            edge_types[e_slots:] = t_self
            tile_types[e_slots // tile :] = t_self
            edge_mask[e_slots:] = idents < num_nodes
            total_edges += num_nodes

        adjacency = AdjacencyStruct(
            senders=senders,
            receivers=receivers,
            edge_types=edge_types,
            tile_types=tile_types,
            mask=edge_mask,
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
                r = len(flat)
                ids[:r] = flat
                gidx[:r] = gflat
                mask[:r] = True
            references[name] = ReferenceSet(node_ids=ids, graph_ids=gidx, mask=mask)

        return GraphBatch(
            node_data=node_data,
            adjacency=adjacency,
            edge_feature_data=None,
            node_graph=node_graph,
            node_mask=node_mask,
            references=references,
            num_nodes=np.int32(num_nodes),
            num_edges=np.int32(total_edges),
            num_graphs=np.int32(num_graphs),
            graph_mask=graph_mask,
        )
