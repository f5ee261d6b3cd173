"""Receiver-aligned node-sharded model parallelism — the north-star design.

The reference has no analogue (graphs larger than one device are dropped,
SURVEY.md §5); ``parallel/edge_sharding.py`` scales edge COMPUTE but
replicates node state and psums a full [N, D] partial per layer. This module
shards the nodes themselves:

* shard ``s`` owns node rows ``[s*rows_per, (s+1)*rows_per)`` of the
  flattened batch AND every edge whose receiver lies in those rows. Because
  the unified layout is receiver-major, message aggregation is **complete
  locally** — no cross-shard reduction at all.
* what crosses chips is only the boundary SENDER features each shard reads:
  per layer, one ``all_to_all`` of ``[S, b, D]`` gathered rows over ICI —
  O(boundary * D) exchanged bytes instead of O(N * D).
* each shard's edges are split into an INTERIOR layout (senders owned
  locally) and a BOUNDARY layout (senders in the recv buffer), both valid
  standalone instances of the unified layout with full Pallas aggregation
  plans. Interior message compute has no data dependency on the collective,
  so XLA's latency-hiding scheduler overlaps the all_to_all with it.

Per-shard node-array memory is ``N/S + S*b`` rows; a graph whose node arrays
exceed one chip's budget trains by raising the shard count.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.graph.batching import (
    assemble_layout_arrays,
    build_adjacency_struct,
    required_edge_slots,
    _seg_counts_of,
)
from ptgnn_tpu.graph.structs import AdjacencyStruct, GraphBatch
from ptgnn_tpu.parallel.dp import ShardedPlacementMixin


class BoundaryBudgetError(ValueError):
    """A shard's interior/boundary slots or per-pair boundary-node budget is
    too small for this batch. The required sizes are carried as attributes
    (``required_boundary_budget`` / ``required_interior_slots`` /
    ``required_boundary_slots``) as well as in the message."""

    def __init__(self, msg: str, *, boundary_budget: int = 0,
                 interior_slots: int = 0, boundary_slots: int = 0):
        super().__init__(msg)
        self.required_boundary_budget = boundary_budget
        self.required_interior_slots = interior_slots
        self.required_boundary_slots = boundary_slots


class NodeShardingData(NamedTuple):
    """Per-shard sharding payload carried on GraphBatch.node_sharding.

    Pre-``shard_map`` every array has a leading ``[S]`` axis except the
    ``*_global`` fields (replicated)."""

    adjacency_bnd: AdjacencyStruct  # senders index the [S*b] recv buffer
    send_idx: Any  # [S, b] int32: local rows this shard sends to each dst
    node_graph_global: Any  # [N_pad] int32
    node_mask_global: Any  # [N_pad] bool
    boundary_counts: Any  # [S] int32: real boundary rows this shard sends per dst
    # Global [n_blocks, att_block] attention packing (renumbered when the
    # reorder permutes nodes); None when the batch carries none. Consumed by
    # the self-attention layer's gather-based node-sharded path.
    att_order_global: Any = None


class NodeShardCtx(NamedTuple):
    """Runtime per-layer pieces handed to layers via GraphContext.node_sharding."""

    axis: str
    rows_per: int
    adj_int: AdjacencyStruct  # interior layout (with aggregation plan)
    adj_bnd: AdjacencyStruct  # boundary layout (with aggregation plan)
    h_local: jax.Array  # [rows_per, D] this layer's input local rows
    recv: jax.Array  # [S*b, D] boundary sender features (post-exchange)
    node_graph_global: Any  # [N_pad] int32 (for layers needing global stats)
    node_mask_global: Any  # [N_pad] bool
    att_order_global: Any = None  # global attention packing (see above)


# ---------------------------------------------------------------------------
# Host-side resharding of a finalized GraphBatch
# ---------------------------------------------------------------------------
def _bfs_locality_order(
    senders: np.ndarray,
    receivers: np.ndarray,
    node_graph: np.ndarray,
    node_mask: np.ndarray,
) -> np.ndarray:
    """Bandwidth-reducing node order (Cuthill-McKee-style BFS per graph).

    Contiguous-range node partitions cut exactly the edges that cross range
    boundaries, so the exchange volume is the *bandwidth* of the node
    numbering, not a property of the graph alone. Program graphs (ASTs,
    token chains) have strong locality, but tensorization-order numbering
    need not expose it; a BFS/Cuthill-McKee numbering does — the same move
    METIS-style partitioners make in distributed GNN systems, done here as
    a cheap linear-time pass. Returns ``perm`` with ``perm[new_row] ==
    old_row``; padding rows go last.

    Uses scipy's C-compiled reverse Cuthill-McKee when available (graphs in
    the flattened batch are separate components, so per-graph locality is
    preserved); falls back to a pure-Python per-graph BFS otherwise.
    """
    n_pad = len(node_mask)
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        und_src = np.concatenate([senders, receivers])
        und_dst = np.concatenate([receivers, senders])
        m = coo_matrix(
            (np.ones(len(und_src), np.int8), (und_src, und_dst)),
            shape=(n_pad, n_pad),
        ).tocsr()
        perm = np.asarray(reverse_cuthill_mckee(m, symmetric_mode=True), np.int64)
        # keep padding rows at the tail (RCM treats isolated rows as their
        # own components and can interleave them)
        masked = node_mask[perm]
        return np.concatenate([perm[masked], perm[~masked]])
    except ImportError:  # pragma: no cover - scipy is in the base image
        pass

    und_src = np.concatenate([senders, receivers])
    und_dst = np.concatenate([receivers, senders])
    order_e = np.argsort(und_src, kind="stable")
    und_dst = und_dst[order_e]
    starts = np.searchsorted(und_src[order_e], np.arange(n_pad + 1))

    from collections import deque

    visited = np.zeros(n_pad, bool)
    perm = np.empty(n_pad, np.int64)
    pos = 0
    for seed in np.nonzero(node_mask)[0]:
        if visited[seed]:
            continue
        g = node_graph[seed]
        visited[seed] = True
        dq = deque([int(seed)])
        while dq:
            u = dq.popleft()
            perm[pos] = u
            pos += 1
            for v in und_dst[starts[u] : starts[u + 1]]:
                if not visited[v] and node_mask[v] and node_graph[v] == g:
                    visited[v] = True
                    dq.append(int(v))
    rest = np.nonzero(~visited)[0]  # padding rows (and masked stragglers)
    perm[pos:] = rest
    return perm


def _boundary_rows_under(senders, receivers, rows_per: int, num_shards: int) -> int:
    """Count the distinct (sender row, reader shard) pairs a contiguous-range
    partition would exchange — the quantity the budgets pay for."""
    ss = senders // rows_per
    rs = receivers // rows_per
    cross = ss != rs
    if not cross.any():
        return 0
    pairs = senders[cross].astype(np.int64) * num_shards + rs[cross]
    return len(np.unique(pairs))


def shard_batch_by_nodes(
    minibatch: Dict[str, Any],
    num_shards: int,
    *,
    boundary_budget: int,
    interior_slots: int,
    boundary_slots: int,
    num_fwd_edge_types: Optional[int] = None,
    introduce_backwards_edges: bool = False,
    reorder: Optional[str] = "auto",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reshard one finalized (host numpy) minibatch receiver-aligned.

    Returns (sharded minibatch, exchange stats). Budgets are static so every
    batch of a configuration compiles once:
      * ``interior_slots`` / ``boundary_slots``: padded edge slots per shard;
      * ``boundary_budget``: boundary sender rows per ordered shard pair.
    Raises BoundaryBudgetError with the required sizes when exceeded.

    ``reorder`` controls the node numbering the contiguous-range partition
    cuts against; message passing is permutation-equivariant, so results
    are unchanged in every mode:
      * ``"auto"`` (default): compute the BFS/Cuthill-McKee renumbering and
        keep whichever of {tensorization order, renumbered} exchanges fewer
        boundary rows — data already numbered with locality (pre-order
        ASTs) keeps its order, scrambled numberings get repaired;
      * ``"bfs"``: always renumber (see ``_bfs_locality_order``);
      * ``None``: always partition in tensorization order.
    """
    batch: GraphBatch = minibatch["batch"]
    adj = batch.adjacency
    n_pad = batch.max_nodes
    S = num_shards
    assert n_pad % S == 0, (n_pad, S)
    rows_per = n_pad // S
    tile = adj.edge_tile
    # The per-shard layouts are assembled fresh, so they pick their own
    # aggregation row-block size: the original agg_rows when it divides the
    # shard, else the largest power-of-two divisor of rows_per below it.
    r = min(adj.agg_rows, rows_per)
    while rows_per % r:
        r //= 2
    assert r >= 8, (
        f"rows per shard ({rows_per}) leaves no usable agg_rows "
        f"(from {adj.agg_rows})"
    )
    align = tile
    if adj.super_tile_row_blocks is not None:
        align = adj.senders.shape[0] // adj.super_tile_row_blocks.shape[0]
    num_types = int(adj.edge_types.max()) + 1 if adj.edge_types.size else 1
    b = boundary_budget
    assert interior_slots % tile == 0 and boundary_slots % tile == 0

    mask = np.asarray(adj.mask)
    real = np.nonzero(mask)[0]
    s_arr = np.asarray(adj.senders)[real]
    r_arr = np.asarray(adj.receivers)[real]
    t_arr = np.asarray(adj.edge_types)[real]
    f_arr = (
        np.asarray(adj.edge_feature_slot)[real]
        if adj.edge_feature_slot is not None
        else np.full(len(real), -1, np.int32)
    )

    node_graph_h = np.asarray(batch.node_graph)
    node_mask_h = np.asarray(batch.node_mask)
    if reorder in ("bfs", "auto"):
        perm = _bfs_locality_order(s_arr, r_arr, node_graph_h, node_mask_h)
        inv = np.empty(n_pad + 1, np.int64)
        inv[perm] = np.arange(n_pad)
        inv[n_pad] = n_pad  # padded reference slots point past the end
        if reorder == "auto":
            # keep whichever numbering cuts fewer boundary rows: data whose
            # tensorization order already exposes locality (e.g. pre-order
            # ASTs) can beat a generic BFS renumbering
            before = _boundary_rows_under(s_arr, r_arr, rows_per, S)
            after = _boundary_rows_under(inv[s_arr], inv[r_arr], rows_per, S)
            if before <= after:
                perm = inv = None
        if perm is not None:
            s_arr = inv[s_arr]
            r_arr = inv[r_arr]
            node_graph_h = node_graph_h[perm]
            node_mask_h = node_mask_h[perm]
    elif reorder is None:
        perm = inv = None
    else:
        raise ValueError(f"unknown reorder mode {reorder!r}")

    recv_shard = r_arr // rows_per
    send_shard = s_arr // rows_per

    # boundary sender lists per ordered (owner -> reader) pair
    pair_lists: Dict[Tuple[int, int], np.ndarray] = {}
    int_layouts: List[Tuple[np.ndarray, ...]] = []
    bnd_layouts: List[Tuple[np.ndarray, ...]] = []
    max_pair = 0
    req_int = req_bnd = 0
    num_blocks_local = rows_per // r

    for s in range(S):
        mine = recv_shard == s
        interior = mine & (send_shard == s)
        boundary = mine & (send_shard != s)

        ri = (r_arr[interior] - s * rows_per).astype(np.int32)
        si = (s_arr[interior] - s * rows_per).astype(np.int32)
        ti = t_arr[interior].astype(np.int32)
        fi = f_arr[interior].astype(np.int32)

        rb = (r_arr[boundary] - s * rows_per).astype(np.int32)
        sb_global = s_arr[boundary]
        tb = t_arr[boundary].astype(np.int32)
        fb = f_arr[boundary].astype(np.int32)
        owners = send_shard[boundary]
        # recv-buffer index: owner*b + rank of the sender in the sorted
        # unique per-pair list (the same list the owner's send_idx is built
        # from, so both sides agree on slot numbering).
        sb_local = np.zeros(len(sb_global), np.int32)
        for o in range(S):
            if o == s:
                continue
            sel = owners == o
            uniq = np.unique(sb_global[sel])
            pair_lists[(o, s)] = uniq
            max_pair = max(max_pair, len(uniq))
            if len(uniq) > b:
                continue  # error raised after the full requirement scan
            sb_local[sel] = o * b + np.searchsorted(uniq, sb_global[sel]).astype(
                np.int32
            )

        req_int = max(req_int, required_edge_slots(
            _seg_counts_of(ri, ti, r, num_types),
            tile=tile, align=align, num_blocks=num_blocks_local,
        ))
        req_bnd = max(req_bnd, required_edge_slots(
            _seg_counts_of(rb, tb, r, num_types),
            tile=tile, align=align, num_blocks=num_blocks_local,
        ))

        int_layouts.append((si, ri, ti, fi))
        bnd_layouts.append((sb_local, rb, tb, fb))

    if max_pair > b or req_int > interior_slots or req_bnd > boundary_slots:
        raise BoundaryBudgetError(
            f"node-sharding budgets too small for this batch: needs "
            f"boundary_budget>={max_pair} (have {b}), "
            f"interior_slots>={req_int} (have {interior_slots}), "
            f"boundary_slots>={req_bnd} (have {boundary_slots})",
            boundary_budget=max_pair,
            interior_slots=req_int,
            boundary_slots=req_bnd,
        )

    def assemble(arrays, e_pad, sender_domain):
        si, ri, ti, fi = arrays
        out = assemble_layout_arrays(
            si, ri, ti, fi, max_nodes=rows_per, e_pad=e_pad, tile=tile,
            agg_rows=r, num_types=num_types, align=align,
            sender_domain=sender_domain,
        )
        assert out is not None, "slot requirement was checked above"
        return build_adjacency_struct(
            out, tile=tile, align=align,
            num_fwd_types=num_fwd_edge_types or num_types,
            introduce_backwards_edges=introduce_backwards_edges,
        )

    adj_int = [assemble(a, interior_slots, rows_per) for a in int_layouts]
    adj_bnd = [assemble(a, boundary_slots, S * b) for a in bnd_layouts]

    send_idx = np.zeros((S, S, b), np.int32)
    boundary_counts = np.zeros((S, S), np.int32)
    for (o, d), uniq in pair_lists.items():
        send_idx[o, d, : len(uniq)] = uniq - o * rows_per
        boundary_counts[o, d] = len(uniq)

    def stack_adj(adjs: List[AdjacencyStruct]) -> AdjacencyStruct:
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *adjs)

    rows_ext = rows_per + S * b
    g_pad = batch.max_graphs
    node_graph = node_graph_h.reshape(S, rows_per)
    node_mask = node_mask_h.reshape(S, rows_per)
    node_graph_ext = np.concatenate(
        [node_graph, np.full((S, S * b), g_pad, node_graph.dtype)], axis=1
    )
    node_mask_ext = np.concatenate(
        [node_mask, np.zeros((S, S * b), bool)], axis=1
    )

    def slice_nodes(x):
        x = np.asarray(x)
        assert x.shape[0] == n_pad, (
            f"node_data array with leading dim {x.shape[0]} != max_nodes "
            f"{n_pad} cannot be node-sharded"
        )
        if perm is not None:
            x = x[perm]
        return x.reshape((S, rows_per) + x.shape[1:])

    references = batch.references
    if perm is not None and references:
        def remap_ref(ref):
            ids = np.asarray(ref.node_ids)
            m = np.asarray(ref.mask)
            new_ids = np.where(m, inv[np.clip(ids, 0, n_pad)], ids)
            return ref._replace(node_ids=new_ids.astype(ids.dtype))

        references = {k: remap_ref(v) for k, v in references.items()}

    att_order_global = batch.att_order
    if att_order_global is not None:
        att_order_global = np.asarray(att_order_global)
        if perm is not None:
            # packing entries are node ids; padding slots hold n_pad
            att_order_global = np.where(
                att_order_global < n_pad,
                inv[np.minimum(att_order_global, n_pad)],
                att_order_global,
            ).astype(att_order_global.dtype)

    sharded_batch = batch._replace(
        node_data=jax.tree_util.tree_map(slice_nodes, batch.node_data),
        adjacency=stack_adj(adj_int),
        node_graph=node_graph_ext,
        node_mask=node_mask_ext,
        references=references,
        att_order=None,
        node_sharding=NodeShardingData(
            adjacency_bnd=stack_adj(adj_bnd),
            send_idx=send_idx,
            node_graph_global=node_graph_h,
            node_mask_global=node_mask_h,
            boundary_counts=boundary_counts,
            att_order_global=att_order_global,
        ),
    )
    total_boundary = int(boundary_counts.sum())
    stats = {
        "num_shards": S,
        "rows_per_shard": rows_per,
        "rows_ext": rows_ext,
        "boundary_nodes_total": total_boundary,
        "boundary_budget_used": int(boundary_counts.max()),
        "boundary_budget": b,
        # bytes moved per layer per exchange direction at f32; the padded
        # figure is what the static all_to_all actually ships
        "exchanged_rows_real": total_boundary,
        "exchanged_rows_padded": S * (S - 1) * b,
        "interior_slots_required": req_int,
        "boundary_slots_required": req_bnd,
    }
    return {**minibatch, "batch": sharded_batch}, stats


def suggest_budgets(
    minibatches, num_shards: int, *, tile_of=None, reorder: Optional[str] = "auto"
) -> Dict[str, int]:
    """Scan finalized minibatches and return the smallest static budgets
    (rounded up to tile multiples) that fit all of them. ``reorder`` must
    match what the later ``shard_batch_by_nodes`` calls will use."""
    b = e_int = e_bnd = 0
    tile = None
    for mb in minibatches:
        adj = mb["batch"].adjacency
        tile = adj.edge_tile if tile is None else tile
        try:
            shard_batch_by_nodes(
                mb, num_shards, boundary_budget=1, interior_slots=tile,
                boundary_slots=tile, reorder=reorder,
            )
        except BoundaryBudgetError as exc:
            b = max(b, exc.required_boundary_budget)
            e_int = max(e_int, exc.required_interior_slots)
            e_bnd = max(e_bnd, exc.required_boundary_slots)
    tile = tile or 128
    ceil = lambda n, k: -(-max(n, 1) // k) * k
    return {
        "boundary_budget": max(b, 8),
        "interior_slots": ceil(e_int, tile),
        "boundary_slots": ceil(e_bnd, tile),
    }


# ---------------------------------------------------------------------------
# In-trace pieces
# ---------------------------------------------------------------------------
def exchange_boundary(h_local: jax.Array, send_idx: jax.Array, axis: str) -> jax.Array:
    """One boundary-feature exchange: gather the rows each destination needs
    and all_to_all them over ``axis``. Returns the flattened [S*b, D] recv
    buffer where rows ``o*b..o*b+b`` came from shard ``o``."""
    S, b = send_idx.shape
    buf = jnp.take(h_local, send_idx.reshape(-1), axis=0).reshape(
        S, b, h_local.shape[-1]
    )
    recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=True)
    return recv.reshape(S * b, h_local.shape[-1])


def merged_adjacency(adj_int: AdjacencyStruct, adj_bnd: AdjacencyStruct, rows_per: int) -> AdjacencyStruct:
    """One plan-less adjacency over the [h_local ++ recv] buffer for generic
    layers (multi-hidden-layer MLPs, PNA, edge features): interior senders
    keep their local ids, boundary senders shift past ``rows_per``. The
    aggregation plans do not concatenate (their block runs would interleave),
    so generic layers aggregate through the XLA segment ops."""

    def cat(a, b_):
        return jnp.concatenate([a, b_], axis=0)

    return AdjacencyStruct(
        senders=cat(adj_int.senders, adj_bnd.senders + rows_per),
        receivers=cat(adj_int.receivers, adj_bnd.receivers),
        edge_types=cat(adj_int.edge_types, adj_bnd.edge_types),
        tile_types=cat(adj_int.tile_types, adj_bnd.tile_types),
        mask=cat(adj_int.mask, adj_bnd.mask),
        edge_feature_slot=(
            None
            if adj_int.edge_feature_slot is None
            else cat(adj_int.edge_feature_slot, adj_bnd.edge_feature_slot)
        ),
    )


def _sub_reduce(messages, adj: AdjacencyStruct, rows_per: int, reduction: str,
                mask, counts_exact: bool):
    """Plan (Pallas) or XLA segment reduce of one sub-layout to local rows."""
    from ptgnn_tpu.graph.messagepassing.base import _use_pallas_aggregation
    from ptgnn_tpu.ops.segment import segment_reduce

    if adj.has_aggregation_plan and _use_pallas_aggregation():
        from ptgnn_tpu.ops.pallas.segment_kernels import adjacency_segment_reduce

        return adjacency_segment_reduce(
            messages, adj, rows_per, reduction, mask=mask,
            counts_exact=counts_exact,
        )
    return segment_reduce(messages, adj.receivers, rows_per, reduction, mask=mask)


def node_sharded_linear_message_aggregation(
    weight_stack,
    ctx,
    *,
    reduction: str,
    use_target_state: bool,
    dropout_rate: float,
    train: bool,
    rng,
):
    """Single-linear message + aggregation under node sharding — the hot
    path. Interior and boundary edges run as two separate gather -> typed
    matmul -> planned segment reduce passes; the interior pass has no data
    dependency on the all_to_all, so the collective overlaps it. Returns the
    combined aggregate padded to the caller's extended row count."""
    from ptgnn_tpu.nn.layers import dropout as apply_dropout
    from ptgnn_tpu.nn.module import fold
    from ptgnn_tpu.ops.segment import segment_count
    from ptgnn_tpu.ops.typed_linear import typed_tile_matmul

    ns: NodeShardCtx = ctx.node_sharding
    rows_per = ns.rows_per
    h_local, recv = ns.h_local, ns.recv
    exact = ctx.edge_mask_is_static

    def one_side(adj, source, rng_k, sum_reduction):
        x = jnp.take(source, adj.senders, axis=0)
        if use_target_state:
            safe_recv = jnp.minimum(adj.receivers, rows_per - 1)
            x = jnp.concatenate([x, jnp.take(h_local, safe_recv, axis=0)], axis=-1)
        x = apply_dropout(rng_k, x, dropout_rate, train)
        msgs = typed_tile_matmul(x, weight_stack, adj.tile_types, adj.edge_tile)
        agg = _sub_reduce(msgs, adj, rows_per, sum_reduction, adj.mask, exact)
        if exact:
            cnt = jnp.reshape(adj.agg_counts, (-1,))[:rows_per]
        else:
            cnt = segment_count(adj.receivers, rows_per, adj.mask)
        return agg, cnt

    base_reduction = "sum" if reduction in ("sum", "add", "mean") else reduction
    a_int, c_int = one_side(ns.adj_int, h_local, fold(rng, 1), base_reduction)
    a_bnd, c_bnd = one_side(ns.adj_bnd, recv, fold(rng, 2), base_reduction)

    if reduction in ("sum", "add"):
        total = a_int + a_bnd
    elif reduction == "mean":
        cnt = (c_int + c_bnd).astype(a_int.dtype)
        total = (a_int + a_bnd) / jnp.maximum(cnt, 1)[:, None]
    else:  # max / min: empty sub-segments were filled with 0 — pick by counts
        pick = jnp.maximum if reduction == "max" else jnp.minimum
        both = pick(a_int, a_bnd)
        total = jnp.where(
            (c_int[:, None] > 0) & (c_bnd[:, None] > 0),
            both,
            jnp.where(
                c_int[:, None] > 0,
                a_int,
                jnp.where(c_bnd[:, None] > 0, a_bnd, jnp.zeros((), a_int.dtype)),
            ),
        )
    # Pad to the caller's extended buffer length (local rows ++ recv tail):
    # layer update functions run rowwise over node_states, whose tail is
    # sliced off by the sharded stack loop after the layer.
    tail = ctx.node_mask.shape[0] - rows_per
    return jnp.concatenate(
        [total, jnp.zeros((tail, total.shape[-1]), total.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# Train-step builder
# ---------------------------------------------------------------------------
class NodeParallel(ShardedPlacementMixin):
    """Train-step builder partitioning one batch's NODES (and their incoming
    edges) across a mesh axis. Parameters and the task head stay replicated;
    per layer each shard exchanges only boundary sender features. See the
    module docstring for the design.

    With ``data_axis`` set the mesh is 2D (data x node): each data row holds
    one independently node-sharded minibatch, gradients/loss/metrics are
    weighted-psum'd over the data axis (exactly parallel/dp.py semantics,
    padding groups carry weight 0), the boundary all_to_all stays confined
    to the node axis, and ``zero1=True`` shards the optimizer moments over
    the data axis. This is BASELINE.json configs[4]'s shape: data-parallel
    across batches, node-parallel within each batch."""

    def __init__(
        self,
        module,
        optimizer,
        mesh,
        *,
        axis: str = "node",
        data_axis: Optional[str] = None,
        enable_amp: bool = False,
        zero1: bool = False,
        boundary_budget: int = 0,
        interior_slots: int = 0,
        boundary_slots: int = 0,
        reorder: Optional[str] = "auto",
    ):
        self.module = module
        self.optimizer = optimizer
        self.mesh = mesh
        self.axis = axis
        self.data_axis = data_axis
        self.enable_amp = enable_amp
        self.zero1 = zero1
        self.num_shards = mesh.shape[axis]
        self.data_size = mesh.shape[data_axis] if data_axis is not None else 1
        if jax.process_count() > 1:
            # Every node group must live inside ONE process: the host feeding
            # a group prepares that group's batch, and hosts rank-shard their
            # data (parallel/distributed_trainer.py), so a node axis spanning
            # processes would assemble shards of DIFFERENT batches into one
            # "global" batch via make_array_from_process_local_data — silent
            # garbage, not an error. Scale across hosts with the data axis.
            node_dim = mesh.axis_names.index(axis)
            groups = np.moveaxis(mesh.devices, node_dim, -1).reshape(
                -1, self.num_shards
            )
            for row in groups:
                procs = {d.process_index for d in row}
                if len(procs) > 1:
                    raise NotImplementedError(
                        "NodeParallel: a node group spans processes "
                        f"{sorted(procs)} — each host rank-shards its data, "
                        "so cross-process node groups would mix different "
                        "batches. Keep node_shards <= devices-per-host and "
                        "put the data axis across hosts."
                    )
        self.set_budgets(
            boundary_budget=boundary_budget,
            interior_slots=interior_slots,
            boundary_slots=boundary_slots,
        )
        self.reorder = reorder
        gnn = getattr(module, "gnn", None) or getattr(module, "_gnn", None)
        assert gnn is not None, "NodeParallel needs a module exposing .gnn"
        gnn.node_partition_axis = axis
        self._gnn = gnn

    def set_budgets(self, *, boundary_budget: int, interior_slots: int,
                    boundary_slots: int) -> None:
        """Budgets may be set after construction (the trainer probes them
        from the first batches of the run, see NodeShardedModelTrainer)."""
        self.boundary_budget = boundary_budget
        self.interior_slots = interior_slots
        self.boundary_slots = boundary_slots

    @property
    def has_budgets(self) -> bool:
        return self.interior_slots > 0 and self.boundary_slots > 0

    def shard_batch(self, minibatch: Dict[str, Any]) -> Dict[str, Any]:
        assert self.has_budgets, (
            "node-sharding budgets are unset; call set_budgets (or probe "
            "with suggest_budgets) before sharding batches"
        )
        sharded, self.last_stats = shard_batch_by_nodes(
            minibatch,
            self.num_shards,
            boundary_budget=self.boundary_budget,
            interior_slots=self.interior_slots,
            boundary_slots=self.boundary_slots,
            reorder=self.reorder,
        )
        return sharded

    def _specs(self, example_sharded_mb, with_data_axis: bool = False):
        """PartitionSpec tree for one node-sharded minibatch; with
        ``with_data_axis`` every spec gains the leading data dimension (the
        stacked [D, ...] group layout)."""
        from jax.sharding import PartitionSpec as P

        lead = (self.data_axis,) if with_data_axis else ()

        def spec_tree(mb):
            rest = jax.tree_util.tree_map(lambda x: P(*lead), mb)
            batch = mb["batch"]
            shard = lambda t: jax.tree_util.tree_map(
                lambda x: P(*lead, self.axis), t
            )
            ns_spec = rest["batch"].node_sharding._replace(
                adjacency_bnd=shard(batch.node_sharding.adjacency_bnd),
                send_idx=P(*lead, self.axis),
                boundary_counts=P(*lead, self.axis),
            )
            rest["batch"] = rest["batch"]._replace(
                node_data=shard(batch.node_data),
                adjacency=shard(batch.adjacency),
                node_graph=P(*lead, self.axis),
                node_mask=P(*lead, self.axis),
                node_sharding=ns_spec,
            )
            return rest

        return spec_tree(example_sharded_mb)

    @staticmethod
    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def _delead_node(self, sharded_mb):
        """Strip the per-shard leading [1] the shard_map hands each device."""

        def delead(t):
            return jax.tree_util.tree_map(
                lambda x: None if x is None else x[0], t
            )

        batch = sharded_mb["batch"]
        ns = batch.node_sharding
        batch = batch._replace(
            node_data=delead(batch.node_data),
            adjacency=delead(batch.adjacency),
            node_graph=batch.node_graph[0],
            node_mask=batch.node_mask[0],
            node_sharding=ns._replace(
                adjacency_bnd=delead(ns.adjacency_bnd),
                send_idx=ns.send_idx[0],
                boundary_counts=ns.boundary_counts[0],
            ),
        )
        return {**sharded_mb, "batch": batch}

    def _per_shard_loss(self, params, sharded_mb, rng, train: bool):
        mb = self._delead_node(sharded_mb)
        if self.enable_amp:
            params = self._cast(params, jnp.bfloat16)
            mb = self._cast(mb, jnp.bfloat16)
        loss, metrics = self.module.apply(params, **mb, train=train, rng=rng)
        return loss.astype(jnp.float32), metrics

    def build_train_step(self, example_sharded_mb):
        """Single-axis (node-only) step over ONE sharded minibatch — the
        library primitive the parity tests drive. The trainer path (data x
        node groups, weights, lr schedules) is build_trainer_steps."""
        from jax.sharding import PartitionSpec as P

        import optax

        from ptgnn_tpu.parallel.dp import _shard_map

        optimizer = self.optimizer

        in_specs = (P(), self._specs(example_sharded_mb), P())
        sharded_loss = _shard_map(
            lambda p, mb, rng: self._per_shard_loss(p, mb, rng, True),
            mesh=self.mesh, in_specs=in_specs, out_specs=(P(), P()),
        )

        def train_step(params, opt_state, sharded_mb, rng):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: sharded_loss(p, sharded_mb, rng), has_aux=True
            )(params)
            grads = self._cast(grads, jnp.float32)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, metrics

        return jax.jit(train_step, donate_argnums=(0, 1))

    # -- trainer interface (DataParallel-compatible; placement/ZeRO-1 live
    # in dp.ShardedPlacementMixin) ------------------------------------------
    @property
    def _opt_shard_axis(self):
        # ZeRO-1 shards the moments over the DATA axis (node-sharded batches
        # share one parameter set per data row).
        if self.zero1 and self.data_axis is not None and self.data_size > 1:
            return self.data_axis
        return None

    @property
    def num_local_devices(self) -> int:
        """DATA-group slots this process feeds per step. No data axis means
        one group total (multi-process without a data axis is rejected at
        construction: node groups may not span processes)."""
        if self.data_axis is None:
            return 1
        local = sum(
            1 for d in self.mesh.devices.flat
            if d.process_index == jax.process_index()
        )
        return max(1, local // self.num_shards)

    def device_put_batch(self, stacked_group):
        """Place one stacked [D, ...] group of node-sharded minibatches with
        its (data, node) shardings."""
        from jax.sharding import NamedSharding

        specs = self._specs(
            stacked_group, with_data_axis=self.data_axis is not None
        )
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs
        )
        return self._put(stacked_group, shardings)

    def device_put_weights(self, weights):
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.data_axis) if self.data_axis is not None else P()
        return self._put(
            np.asarray(weights, np.float32), NamedSharding(self.mesh, spec)
        )

    def _build_group_loss_fn(self, example_stacked_group):
        """shard_map over (data x node) returning the data-weighted mean
        loss (weight 0 = padding group) and aux (data-summed metrics, the
        psum'd weight total — the accumulation normalizer). Gradients
        are taken OUTSIDE this shard_map (build_trainer_steps): shard_map's
        transpose accumulates per-device cotangents into the correct global
        gradient — the same pattern as build_train_step; per-device
        value_and_grad inside the map would double-count the node-replicated
        head contributions."""
        from jax.sharding import PartitionSpec as P

        from ptgnn_tpu.parallel.dp import _shard_map

        daxis = self.data_axis

        def per_device(params, group_mb, rng, w):
            if daxis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(daxis))
                group_mb = jax.tree_util.tree_map(
                    lambda x: None if x is None else x[0], group_mb
                )
            loss, metrics = self._per_shard_loss(params, group_mb, rng, True)
            if daxis is None:
                return loss, (metrics, jnp.asarray(1.0, jnp.float32))
            w = w.reshape(())
            wsum = jnp.maximum(jax.lax.psum(w, daxis), 1e-9)
            loss = jax.lax.psum(loss * w, daxis) / wsum
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.psum(m, daxis), metrics
            )
            return loss, (metrics, wsum)

        with_data = daxis is not None
        in_specs = (
            P(),
            self._specs(example_stacked_group, with_data_axis=with_data),
            P(),
            P(daxis) if with_data else P(),
        )
        return _shard_map(
            per_device, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P(), P()),
        )

    def build_trainer_steps(self):
        """Returns (train_step, eval_step) matching DataParallel's trainer
        protocol:

          train_step(params, opt_state, stacked_group, rng, lr_factor,
                     weights) -> (params, opt_state, loss, metrics)
          eval_step(params, stacked_group, weights) -> (loss, metrics, wsum)

        ``stacked_group`` is [D] node-sharded minibatches stacked on a
        leading data axis (D == 1 arrays without the leading axis when
        data_axis is None). Compilation is lazy: specs derive from the first
        group's tree, so budgets may be probed at epoch start."""
        import optax

        from jax.sharding import PartitionSpec as P

        from ptgnn_tpu.parallel.dp import _shard_map

        optimizer = self.optimizer
        state = {"train": None, "eval": None}

        def build_train(example_group):
            loss_fn = self._build_group_loss_fn(example_group)

            def train_step(params, opt_state, group, rng, lr_factor, weights):
                (loss, (metrics, _)), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, group, rng, weights), has_aux=True
                )(params)
                grads = self._cast(grads, jnp.float32)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(
                    lambda u: u * lr_factor, updates
                )
                params = optax.apply_updates(params, updates)
                if self._opt_shard_axis is not None:
                    params = jax.lax.with_sharding_constraint(
                        params, self.replicated()
                    )
                    opt_state = jax.lax.with_sharding_constraint(
                        opt_state, self._zero1_opt_sharding(opt_state)
                    )
                return params, opt_state, loss, metrics

            return jax.jit(train_step, donate_argnums=(0, 1))

        def build_eval(example_group):
            daxis = self.data_axis

            def per_device_eval(params, group_mb, w):
                if daxis is not None:
                    group_mb = jax.tree_util.tree_map(
                        lambda x: None if x is None else x[0], group_mb
                    )
                loss, metrics = self._per_shard_loss(params, group_mb, None, False)
                if daxis is None:
                    return loss, metrics, jnp.asarray(1.0, jnp.float32)
                w = w.reshape(())
                wsum_raw = jax.lax.psum(w, daxis)
                wsum = jnp.maximum(wsum_raw, 1e-9)
                loss = jax.lax.psum(loss * w, daxis) / wsum
                metrics = jax.tree_util.tree_map(
                    lambda m: jax.lax.psum(m, daxis), metrics
                )
                return loss, metrics, wsum_raw

            with_data = daxis is not None
            in_specs = (
                P(),
                self._specs(example_group, with_data_axis=with_data),
                P(daxis) if with_data else P(),
            )
            return jax.jit(_shard_map(
                per_device_eval, mesh=self.mesh, in_specs=in_specs,
                out_specs=(P(), P(), P()),
            ))

        def train_step(params, opt_state, group, rng, lr_factor, weights=None):
            if weights is None:
                weights = jnp.ones((self.data_size,), jnp.float32)
            if state["train"] is None:
                state["train"] = build_train(group)
            return state["train"](params, opt_state, group, rng, lr_factor, weights)

        def eval_step(params, group, weights=None):
            if weights is None:
                weights = jnp.ones((self.data_size,), jnp.float32)
            if state["eval"] is None:
                state["eval"] = build_eval(group)
            return state["eval"](params, group, weights)

        return train_step, eval_step

    def build_accum_steps(self):
        """Gradient accumulation for the node-sharded trainer path, matching
        DataParallel.build_accum_steps semantics: ``grad_step`` adds one
        group's weighted gradient SUM (and weight total) to a replicated
        accumulator; ``apply_step`` divides by the accumulated weight and
        runs the optimizer once (ZeRO-1 constraints included). Lazily
        compiled from the first group's tree (budgets may be probed at
        epoch start)."""
        import optax

        optimizer = self.optimizer
        state = {"grad": None}

        def build(example_group):
            loss_fn = self._build_group_loss_fn(example_group)

            def grad_step(params, grad_acc, w_acc, group, rng, weights):
                (loss, (metrics, wsum)), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, group, rng, weights), has_aux=True
                )(params)
                grads = self._cast(grads, jnp.float32)
                grad_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g * wsum, grad_acc, grads
                )
                return grad_acc, w_acc + wsum, loss, metrics

            return jax.jit(grad_step, donate_argnums=(1,))

        def grad_step(params, grad_acc, w_acc, group, rng, weights):
            if state["grad"] is None:
                state["grad"] = build(group)
            return state["grad"](params, grad_acc, w_acc, group, rng, weights)

        def apply_step(params, opt_state, grad_acc, w_acc, lr_factor):
            grads = jax.tree_util.tree_map(
                lambda a: a / jnp.maximum(w_acc, 1e-9), grad_acc
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_factor, updates)
            params = optax.apply_updates(params, updates)
            if self._opt_shard_axis is not None:
                params = jax.lax.with_sharding_constraint(
                    params, self.replicated()
                )
                opt_state = jax.lax.with_sharding_constraint(
                    opt_state, self._zero1_opt_sharding(opt_state)
                )
            return params, opt_state

        return grad_step, jax.jit(apply_step, donate_argnums=(0, 1, 2))
