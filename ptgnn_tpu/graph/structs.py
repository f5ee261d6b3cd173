"""Graph containers: raw, tensorized, and the statically shaped device batch.

Raw/tensorized mirror the reference (ptgnn/neuralmodels/gnn/structs.py:12-49).
The device-side ``GraphBatch`` is the central TPU-first redesign: instead of
ragged per-edge-type adjacency lists concatenated to arbitrary sizes (which
would force an XLA recompile per batch), many small graphs are flattened into
ONE padded disconnected graph with

* a fused, **type-blocked** edge array: edges sorted by edge type, each
  type's segment padded up to a multiple of ``edge_tile`` so that every
  tile of ``edge_tile`` consecutive edges has a single edge type
  (``tile_types``). Per-edge-type linear maps then become one batched
  matmul over tiles (MXU-friendly), replacing the reference's Python loop
  over edge types (gatedmessagepassing.py:50-61);
* padding edges with ``receivers == num node slots`` (dropped by segment
  ops) and an explicit ``edge_mask``;
* padding nodes with ``node_graph == num graph slots`` and ``node_mask``;
* fixed budgets (``BatchPadding``) so every batch of a configuration has
  the exact same shapes -> a single compiled executable.

Backwards edges (type id T+t) and self edges (last type id) are materialized
host-side at batch build (the reference builds them per forward pass,
graphneuralnetwork.py:172-186 — device-side list surgery is hostile to XLA).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Generic, List, NamedTuple, Optional, Tuple, TypeVar

import numpy as np

TNodeData = TypeVar("TNodeData")
TEdgeData = TypeVar("TEdgeData")
TTensorizedNodeData = TypeVar("TTensorizedNodeData")
TTensorizedEdgeData = TypeVar("TTensorizedEdgeData")


class GraphData(Generic[TNodeData, TEdgeData]):
    """One raw graph: node payloads, per-edge-type adjacency, named reference
    node sets (reference: structs.py:12-25)."""

    __slots__ = ("node_information", "edges", "edge_features", "reference_nodes")

    def __init__(
        self,
        node_information: List[TNodeData],
        edges: Dict[str, List[Tuple[int, int]]],
        reference_nodes: Dict[str, List[int]],
        edge_features: Optional[Dict[str, List[TEdgeData]]] = None,
    ):
        self.node_information = node_information
        self.edges = edges
        self.edge_features = edge_features
        self.reference_nodes = reference_nodes


class TensorizedGraphData(Generic[TTensorizedNodeData, TTensorizedEdgeData]):
    """One tensorized graph with per-type (src, dst) numpy pairs in canonical
    metadata order (reference: structs.py:28-49)."""

    __slots__ = (
        "num_nodes",
        "node_tensorized_data",
        "adjacency_lists",
        "edge_features",
        "reference_nodes",
    )

    def __init__(
        self,
        num_nodes: int,
        node_tensorized_data: List[TTensorizedNodeData],
        adjacency_lists: List[Tuple[np.ndarray, np.ndarray]],
        edge_features: Optional[List[List[TTensorizedEdgeData]]],
        reference_nodes: Dict[str, np.ndarray],
    ):
        self.num_nodes = num_nodes
        self.node_tensorized_data = node_tensorized_data
        self.adjacency_lists = adjacency_lists
        self.edge_features = edge_features
        self.reference_nodes = reference_nodes

    @property
    def num_edges(self) -> int:
        return sum(len(src) for src, _ in self.adjacency_lists)


@dataclass(frozen=True)
class BatchPadding:
    """Static shape budgets for one batch configuration.

    ``max_edge_slots`` counts *materialized* edge slots: forward types plus
    (if enabled) backward types, each type segment rounded up to a multiple
    of ``edge_tile``. Self edges get their own extra segment of
    ``max_nodes`` slots and are not counted here.
    """

    max_nodes: int
    max_edge_slots: int
    max_graphs: int
    edge_tile: int = 128
    # Receiver rows per aggregation block: the Pallas segment kernel keeps
    # one [agg_rows, D] output block in VMEM while tiles stream through it.
    agg_rows: int = 256
    # Self-attention block size: the batcher emits a [n_blocks, att_block]
    # node permutation that bin-packs each graph's nodes into one block, so
    # block-diagonal attention is EXACT for graphs <= att_block (the
    # reference's chunk semantics, selfattmessagepassing.py:59-75). 0 = off.
    att_block: int = 256
    # Aggregation SUPERTILE for sum/mean reductions: each row block's slot
    # run is padded to a multiple of this, so the sum kernel walks tiles of
    # agg_sum_tile edges (4x fewer grid steps at the default 512 vs the
    # 128-edge type tiles) — sum needs no receiver sortedness within a tile,
    # only one row block per tile. 0 = no alignment (sum runs at edge_tile).
    agg_sum_tile: int = 512
    # (name, budget) pairs for reference-node sets; names not listed get
    # DEFAULT_REFERENCE_BUDGET slots.
    reference_budgets: Tuple[Tuple[str, int], ...] = field(default_factory=tuple)
    default_reference_budget: int = 512

    def reference_budget(self, name: str) -> int:
        for n, b in self.reference_budgets:
            if n == name:
                return b
        return self.default_reference_budget


class ReferenceSet(NamedTuple):
    """A padded named reference-node set."""

    node_ids: Any  # [R_pad] int32, indices into flattened node slots
    graph_ids: Any  # [R_pad] int32, graph slot per reference
    mask: Any  # [R_pad] bool


class AdjacencyStruct(NamedTuple):
    """The fused edge structure of a flattened batch in the unified
    (row block, type, receiver)-sorted layout (see graph/batching.py).

    All fields are arrays so the struct is a plain jit-able pytree; static
    quantities (edge tile size, aggregation rows per block) are derived from
    shapes. The ``local_rows``/``tile_row_blocks``/``agg_counts`` fields form
    the precomputed plan for the Pallas sorted-segment aggregation kernel;
    they are None when a batch is built without the fast-aggregation layout.
    """

    senders: Any  # [E_pad] int32 (padding: 0)
    receivers: Any  # [E_pad] int32 (padding: max_nodes -> dropped by segment ops)
    edge_types: Any  # [E_pad] int32
    tile_types: Any  # [E_pad // edge_tile] int32 (single type per tile)
    mask: Any  # [E_pad] bool
    tile_types_transposed: Any = None  # [n_tiles] int32 type of each tile's transpose
    local_rows: Any = None  # [E_pad, 1] int32 receiver - block*R (padding: R)
    # Sublane-replicated copies of local_rows for the kernels' (8, T) blocks.
    # Host-built by default; None under PTGNN_TPU_DERIVE_ROWS=1, where the
    # kernel wrappers derive them in-trace (hangs Mosaic on the current v5e
    # toolchain — reproduced 2026-08-17 and 2026-08-20; retry on upgrades).
    local_rows_row: Any = None  # [n_tiles * 8, edge_tile] int32
    local_rows_row_super: Any = None  # [n_super * 8, agg_sum_tile] int32
    tile_row_blocks: Any = None  # [n_tiles] int32 (single row block per tile)
    agg_counts: Any = None  # [num_row_blocks, R] int32 in-degrees
    # [n_super] int32, one row block per SUPERTILE of agg_sum_tile edges
    # (present when the batcher aligned block runs; sum/mean kernels then
    # walk supertiles — fewer grid steps, no sortedness requirement).
    super_tile_row_blocks: Any = None
    # Per-slot index into the flattened edge-feature array (-1 = no features:
    # padding and self edges; backward edges share the forward edge's index,
    # reference: graphneuralnetwork.py:172-183).
    edge_feature_slot: Any = None  # [E_pad] int32 or None

    @property
    def edge_tile(self) -> int:
        return self.senders.shape[0] // self.tile_types.shape[0]

    @property
    def agg_rows(self) -> int:
        return self.agg_counts.shape[1]

    @property
    def has_aggregation_plan(self) -> bool:
        return self.tile_row_blocks is not None


class GraphBatch(NamedTuple):
    """A statically shaped flattened minibatch of graphs (device pytree)."""

    node_data: Any  # pytree of [max_nodes, ...] arrays for the node embedder
    adjacency: AdjacencyStruct
    edge_feature_data: Any  # pytree of [E_pad, ...] arrays or None
    node_graph: Any  # [max_nodes] int32 (padding: max_graphs -> dropped)
    node_mask: Any  # [max_nodes] bool
    references: Dict[str, ReferenceSet]
    num_nodes: Any  # scalar int32 (actual count)
    num_edges: Any  # scalar int32 (actual count, incl. materialized bwd/self)
    num_graphs: Any  # scalar int32 (actual count)
    graph_mask: Any  # [max_graphs] bool
    # [n_blocks, att_block] int32 node permutation for exact block-diagonal
    # self-attention (padding slots: max_nodes). None when att_block == 0.
    att_order: Any = None
    # Receiver-aligned node-sharding payload (parallel/node_sharding.py):
    # when set, node_data/adjacency/node_graph/node_mask are per-shard and
    # the GNN runs its boundary-exchange stack. None for ordinary batches.
    node_sharding: Any = None

    @property
    def max_nodes(self) -> int:
        return self.node_graph.shape[0]

    @property
    def max_graphs(self) -> int:
        return self.graph_mask.shape[0]


class GnnOutput(NamedTuple):
    """Output of the GNN engine (reference: structs.py:52-76), plus masks.

    Under node sharding (``shard_axis`` set) the two representation fields
    hold this shard's LOCAL ``[rows_per, D]`` rows — NOT the full node
    table — so the readout never materializes an O(N*D) buffer per shard.
    Heads must go through the accessors: :meth:`reference_rows` /
    :meth:`node_rows` assemble only the requested rows (O(rows*D) via an
    owner-select + psum), :meth:`node_table` explicitly pays the full
    all_gather for heads that genuinely consume every node (per-node
    losses, whole-set summaries). In the unsharded case the accessors are
    plain gathers/identity, so heads written against them run everywhere.
    """

    input_node_representations: Any  # [max_nodes, D] (LOCAL rows when sharded)
    output_node_representations: Any  # [max_nodes, H] (LOCAL rows when sharded)
    node_to_graph_idx: Any  # [max_nodes] int32 (always GLOBAL)
    node_mask: Any  # [max_nodes] bool (always GLOBAL)
    node_idx_references: Dict[str, Any]  # GLOBAL node ids
    node_graph_idx_reference: Dict[str, Any]
    reference_masks: Dict[str, Any]
    num_graphs: Any  # scalar int32
    graph_mask: Any  # [max_graphs] bool
    # Mesh axis name when the representation fields are per-shard local rows
    # (parallel/node_sharding.py); None for ordinary batches.
    shard_axis: Any = None

    @property
    def reference_nodes_idx(self) -> Dict[str, Any]:
        return self.node_idx_references

    @property
    def reference_nodes_graph_idx(self) -> Dict[str, Any]:
        return self.node_graph_idx_reference

    def _table(self, which: str) -> Any:
        assert which in ("output", "input"), which
        return (
            self.output_node_representations
            if which == "output"
            else self.input_node_representations
        )

    def node_table(self, which: str = "output") -> Any:
        """The FULL [max_nodes, D] node table. Under sharding this is one
        all_gather — O(N*D) per shard — so only heads that truly read every
        node (PPI's per-node loss, whole-graph summaries) should call it;
        row lookups belong in :meth:`node_rows` / :meth:`reference_rows`."""
        if self.shard_axis is None:
            return self._table(which)
        import jax

        return jax.lax.all_gather(self._table(which), self.shard_axis, tiled=True)

    def node_rows(self, node_ids: Any, which: str = "output") -> Any:
        """Gather rows by GLOBAL node id without materializing the full
        table: each shard contributes the rows it owns, one psum of the
        [rows, D] result replicates them. Out-of-range ids clamp (the
        ``jnp.take`` default the unsharded path uses); mask padding slots
        downstream as usual."""
        import jax
        import jax.numpy as jnp

        if self.shard_axis is None:
            return jnp.take(self._table(which), node_ids, axis=0)
        local = self._table(which)
        rows_per = local.shape[0]
        total = rows_per * jax.lax.psum(1, self.shard_axis)
        ids = jnp.clip(node_ids, 0, total - 1)
        mine = (ids // rows_per) == jax.lax.axis_index(self.shard_axis)
        picked = jnp.take(local, jnp.where(mine, ids % rows_per, 0), axis=0)
        contrib = jnp.where(mine[..., None], picked, jnp.zeros((), picked.dtype))
        return jax.lax.psum(contrib, self.shard_axis)

    def reference_rows(self, name: str, which: str = "output") -> Any:
        """[R_pad, D] representations of the named reference set — the
        O(refs*D) readout heads should use (VERDICT r4: replaces the
        replicated all_gathered-table gather)."""
        return self.node_rows(self.node_idx_references[name], which)


class AbstractNodeEmbedder:
    """Node-embedder marker interface (reference: structs.py:79-84)."""

    def representation_size(self) -> int:
        raise NotImplementedError
