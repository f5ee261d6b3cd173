"""Pallas TPU kernels for sorted-segment reductions (message aggregation).

This is the performance path replacing torch-scatter (the reference's only
native dependency, see SURVEY.md §2.6). XLA lowers `jax.ops.segment_*` with
random indices to a serialized scatter (~8-17 ms for [400k, 64] on v5e — the
dominant cost of every message-passing layer). The TPU-native formulation:

1. Host-side (once per batch, numpy — receivers are static per batch): sort
   edges by receiver, group them into *row blocks* of ``R`` consecutive
   output rows, and pad each group to a multiple of ``agg_tile`` so that
   every tile of ``agg_tile`` edges touches exactly one row block
   (`build_aggregation_plan`).
2. Device-side: one sequential-grid kernel walks the edge tiles. Scatter
   becomes a **one-hot matmul on the MXU**: ``acc[R, D] += onehot(local_rows
   [agg_tile, R]).T @ data[agg_tile, D]``. The output row block stays
   resident in VMEM while consecutive tiles map to it (Pallas revisiting
   semantics) and is flushed exactly once — the whole reduction reads the
   edge data once and writes the output once, i.e. runs at HBM speed with
   the arithmetic on the MXU.
3. max/min use the same structure: a log2(agg_tile)-step segmented
   shift-max produces each run's extremum at its last edge (edges within a
   tile are receiver-sorted, so runs are contiguous), and the one-hot
   matmul then *selects* (sums exactly one value per row) instead of
   accumulating.

Maintenance note: the production extremum kernel is FROZEN on the current
toolchain — any structural edit has hung the Mosaic compiler on v5e four
times (see ROUND_NOTES.md). Three experimental variants (VMEM-resident
output, two-phase partials, block-loop manual DMA) were interpreter-exact
but hung or lost on device; they were pruned in round 3 and live in git
history (`git show cb1cc90:ptgnn_tpu/ops/pallas/segment_kernels.py`) for
retrieval after a jax/Mosaic upgrade. The one retained gate is
``PTGNN_TPU_EXT_BF16_SEL`` (bf16 selection matmul in the extremum kernel,
exact for one-hot selection): interpreter-verified, expected ~2x on the
extremum's MXU portion, hangs the CURRENT toolchain — flip it on after an
upgrade and run tests/test_pallas_segment.py.

Gradients are custom VJPs: sum/mean backward is a plain gather; max/min
backward splits the cotangent among tied extrema (jax.ops.segment_max
semantics), using the sum kernel for the tie counts.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # finite stand-in for +/- inf inside kernels (f32 max ~3.4e38)


def replicate_rows_sublanes(local_rows: np.ndarray, granularity: int) -> np.ndarray:
    """[E] per-slot local row ids -> the kernel's [n_tiles*8, granularity]
    operand: each tile's row vector replicated over 8 sublanes so the (8, T)
    VMEM block is a natural tile shape. This IS the kernel's BlockSpec
    contract."""
    n = local_rows.size // granularity
    return np.repeat(
        local_rows.reshape(n, granularity), 8, axis=0
    ).reshape(n * 8, granularity)


def rows_row_operand(plan: "AggregationPlan") -> jax.Array:
    """The kernels' [num_tiles*8, agg_tile] sublane-replicated row operand.

    When the plan does not carry it pre-materialized (``local_rows_row is
    None`` — batches built under ``PTGNN_TPU_DERIVE_ROWS=1``, which skip
    shipping the 8x copy host->device: it is 2/3 of a batch's transfer
    bytes), it is derived here ON DEVICE from ``local_rows`` with one
    broadcast+reshape, layout-identical to :func:`replicate_rows_sublanes`.
    Interpreter-exact, but feeding Pallas this computed operand HANGS the
    Mosaic pipeline on the current v5e toolchain (reproduced 2026-08-17,
    2026-08-20) — hence the host-built default (graph/batching.py)."""
    if plan.local_rows_row is not None:
        return plan.local_rows_row
    num_tiles = plan.tile_row_blocks.shape[0]
    agg_tile = plan.local_rows.shape[0] // num_tiles
    flat = plan.local_rows.reshape(num_tiles, 1, agg_tile)
    return jnp.broadcast_to(flat, (num_tiles, 8, agg_tile)).reshape(
        num_tiles * 8, agg_tile
    )


class AggregationPlan(NamedTuple):
    """Host-precomputed receiver-sorted layout (see build_aggregation_plan).

    Shapes encode the static kernel config: R = counts.shape[1],
    num_row_blocks = counts.shape[0], agg_tile = local_rows.shape[1],
    num_tiles = local_rows.shape[0].
    """

    # None perm = identity: the edge data is already in plan order (the
    # batcher's unified layout, graph/batching.py).
    perm: Optional[jax.Array]  # [num_tiles * agg_tile] int32 (pad: E) or None
    local_rows: jax.Array  # [num_tiles * agg_tile, 1] int32 in [0, R]; R = padding sentinel
    local_rows_row: jax.Array  # [num_tiles * 8, agg_tile] int32; row-major copy
    # (8x sublane-replicated so a (8, agg_tile) block is legal; kernels read
    # row 0 to build the one-hot directly in [R, agg_tile] orientation --
    # avoiding an in-kernel transpose of the one-hot operand)
    tile_row_blocks: jax.Array  # [num_tiles] int32, non-decreasing
    counts: jax.Array  # [num_row_blocks, R] int32 per-node in-degree


def build_aggregation_plan(
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    rows_per_block: int = 256,
    agg_tile: int = 512,
    num_tiles: Optional[int] = None,
) -> AggregationPlan:
    """numpy, host-side, once per batch. ``receivers`` may contain the
    out-of-range padding value (>= num_nodes); those slots are excluded.

    ``num_tiles`` fixes the static tile budget (for constant shapes across
    batches); it must be >= the required tiles:
    ceil((E_real + num_row_blocks * (agg_tile - 1)) / agg_tile) in the worst
    case — callers should size it via `plan_num_tiles`.
    """
    r = rows_per_block
    num_row_blocks = -(-num_nodes // r)
    valid = np.logical_and(edge_mask, receivers < num_nodes)
    idx = np.nonzero(valid)[0].astype(np.int32)
    recv = receivers[idx]
    order = np.argsort(recv, kind="stable")
    idx = idx[order]
    recv = recv[order]

    blocks = recv // r  # non-decreasing
    # Edges per row block, each padded up to a tile multiple.
    counts_per_block = np.bincount(blocks, minlength=num_row_blocks)
    padded_counts = ((counts_per_block + agg_tile - 1) // agg_tile) * agg_tile
    # Every row block needs >= 1 tile so its output block gets initialized
    # (an all-padding tile writes the neutral element).
    padded_counts = np.maximum(padded_counts, agg_tile)
    tiles_per_block = padded_counts // agg_tile
    required_tiles = max(1, int(tiles_per_block.sum()))
    if num_tiles is None:
        num_tiles = required_tiles
    assert num_tiles >= required_tiles, (
        f"aggregation plan needs {required_tiles} tiles, budget is {num_tiles}"
    )

    e_sorted = num_tiles * agg_tile
    e_total = len(receivers)
    perm = np.full(e_sorted, e_total, np.int32)
    local_rows = np.full(e_sorted, r, np.int32)
    tile_row_blocks = np.zeros(num_tiles, np.int32)

    cursor = 0
    tile_cursor = 0
    start = 0
    for b in range(num_row_blocks):
        c = int(counts_per_block[b])
        if c > 0:
            perm[cursor : cursor + c] = idx[start : start + c]
            local_rows[cursor : cursor + c] = recv[start : start + c] - b * r
        tile_row_blocks[tile_cursor : tile_cursor + tiles_per_block[b]] = b
        cursor += padded_counts[b]
        tile_cursor += tiles_per_block[b]
        start += c
    # Trailing spare tiles map to the last block (all-padding, re-writing it
    # is harmless since their contribution is neutral).
    if tile_cursor < num_tiles:
        tile_row_blocks[tile_cursor:] = num_row_blocks - 1

    counts = np.zeros(num_row_blocks * r, np.int32)
    np.add.at(counts, recv, 1)

    return AggregationPlan(
        perm=perm,
        local_rows=local_rows.reshape(num_tiles * agg_tile, 1),
        local_rows_row=replicate_rows_sublanes(local_rows, agg_tile),
        tile_row_blocks=tile_row_blocks,
        counts=counts.reshape(num_row_blocks, r),
    )


def plan_num_tiles(
    max_edges: int, num_nodes: int, rows_per_block: int = 256, agg_tile: int = 512
) -> int:
    """Static tile budget: worst case every row block needs padding."""
    num_row_blocks = -(-num_nodes // rows_per_block)
    return -(-max_edges // agg_tile) + num_row_blocks


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _sum_kernel(tile_rb_ref, rows_row_ref, data_ref, out_ref):
    t = pl.program_id(0)
    rows_row = rows_row_ref[0:1, :]  # [1, agg_tile]
    r = out_ref.shape[0]

    prev_rb = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_start = jnp.logical_or(t == 0, tile_rb_ref[t] != prev_rb)

    onehot_t = (
        jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) == rows_row
    ).astype(data_ref.dtype)  # [R, agg_tile]; sentinel row R matches nothing

    # bf16 inputs: a single MXU pass accumulates exactly in f32; f32 inputs
    # need HIGHEST to avoid bf16-split rounding.
    precision = (
        jax.lax.Precision.DEFAULT
        if data_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    contrib = jax.lax.dot_general(
        onehot_t,
        data_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [R, D]

    @pl.when(is_start)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(is_start))
    def _():
        out_ref[:] = out_ref[:] + contrib


def _broadcast_kernel(tile_rb_ref, local_rows_ref, node_ref, out_ref):
    """Inverse of the aggregation: route node-block rows OUT to edge slots.

    out[agg_tile, D] = onehot(local_rows)[agg_tile, R] @ node_block[R, D].
    One-hot selection is exact at any matmul precision (each output row sums
    exactly one 1.0 * v product, and 1.0 is exact in bf16). Padding slots
    carry the sentinel row R, match nothing, and come out 0 — the fill value
    every consumer wants. Each output tile is written exactly once (no
    revisiting/accumulation), and the node block stays VMEM-resident across
    the consecutive tiles that map to it, so the whole op is one sequential
    read of the table and one sequential write of the edge rows — a
    dense-bandwidth replacement for XLA's row-at-a-time gather (4-6x on
    v5e at bench shapes)."""
    del tile_rb_ref  # consumed by the node BlockSpec index_map
    r = node_ref.shape[0]
    tile = local_rows_ref.shape[0]
    onehot = (
        local_rows_ref[:] == jax.lax.broadcasted_iota(jnp.int32, (tile, r), 1)
    ).astype(node_ref.dtype)  # [agg_tile, R]
    # bf16 runs one exact MXU pass (selection of bf16 values is exact: each
    # output row sums exactly one 1.0 * v product). f32 needs HIGHEST for
    # exact reconstruction (Mosaic rejects HIGH, and DEFAULT rounds f32
    # through one bf16 pass); the hot AMP paths are all bf16.
    precision = (
        jax.lax.Precision.DEFAULT
        if node_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    out_ref[:] = jax.lax.dot_general(
        onehot,
        node_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(out_ref.dtype)


@jax.custom_vjp
def planned_broadcast_to_edges(table, receivers, plan):
    """[N, D] node table -> [E_sorted, D] per-edge rows (table[receivers]),
    in plan order. Padding slots (plan sentinel) read 0. The table is padded
    up to the plan's row-block grid; receivers are only used by the VJP
    (scatter-add = the sum kernel)."""
    num_tiles = plan.tile_row_blocks.shape[0]
    agg_tile = plan.local_rows.shape[0] // num_tiles
    num_row_blocks, r = plan.counts.shape
    d = table.shape[1]
    padded_rows = num_row_blocks * r
    if table.shape[0] < padded_rows:
        table = jnp.pad(table, ((0, padded_rows - table.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tile_row_blocks
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((agg_tile, 1), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (agg_tile, d), lambda t, rb: (t, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _broadcast_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles * agg_tile, d), table.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * agg_tile * r * d,
            bytes_accessed=(num_tiles * agg_tile + num_row_blocks * r)
            * d
            * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(plan.tile_row_blocks, plan.local_rows, table)


def _broadcast_fwd(table, receivers, plan):
    out = planned_broadcast_to_edges(table, receivers, plan)
    return out, (receivers, plan, table.shape[0])


def _broadcast_bwd(res, g):
    receivers, plan, n = res
    # g is already in PLAN order (the forward's output order), so the sum
    # kernel must not re-permute it; padding slots contribute nothing (the
    # sum kernel's one-hot drops the sentinel rows regardless of g there).
    d_table = planned_segment_sum(g, receivers, plan._replace(perm=None), n)
    return d_table.astype(g.dtype), None, None


planned_broadcast_to_edges.defvjp(_broadcast_fwd, _broadcast_bwd)


def _broadcast_min_tile() -> int:
    """Below this grid tile the kernel is sequential-grid-overhead-bound and
    loses to XLA's gather (v5e: 128-edge tiles floor at ~85 us per [49k, 64]
    call vs the gather's ~76 us; 512-edge supertiles run at ~30-50 us).
    Overridable for tests/tuning."""
    import os

    return int(os.environ.get("PTGNN_TPU_BCAST_MIN_TILE", "256"))


def masked_take_rows(table, receivers, num_rows):
    """table[receivers] with 0 at out-of-range slots — the XLA-gather twin
    of the broadcast kernel (consumers rely on zeroed padding rows)."""
    safe = jnp.minimum(receivers, num_rows - 1)
    rows = jnp.take(table, safe, axis=0)
    return jnp.where((receivers < num_rows)[:, None], rows, jnp.zeros((), rows.dtype))


def adjacency_broadcast_to_edges(table, adj):
    """table[adj.receivers] over the batch's unified layout (identity plan
    order), with 0 at padding slots — the gather dual of
    ``adjacency_segment_reduce``. Runs the Pallas kernel on the supertile
    plan when the batch aligned one (the broadcast needs only tile ->
    single-row-block, not receiver sortedness within a tile); small-tile
    layouts keep XLA's gather, which beats the kernel's grid overhead
    there (see _broadcast_min_tile)."""
    plan = sum_plan_from_adjacency(adj)
    if not _broadcast_eligible(plan, table.dtype):
        return masked_take_rows(table, adj.receivers, table.shape[0])
    return planned_broadcast_to_edges(table, adj.receivers, plan)


def _use_bf16_selection() -> bool:
    # DISABLED: single-pass bf16 selection (exact for one-hot selection of
    # bf16-valued run extrema) hangs Mosaic at compile on v5e through this
    # toolchain — observed 2026-08-17 as a frozen server-side compile (host
    # CPU idle, never returns; chip wedged until the watchdog clears it).
    # Correct under the interpreter (test_planned_reduce_bf16_exact with the
    # flag set). Retry on a newer jax/Mosaic.
    import os

    return bool(os.environ.get("PTGNN_TPU_EXT_BF16_SEL"))


def _extremum_kernel(
    tile_rb_ref, local_rows_ref, rows_row_ref, data_ref, out_ref, *, is_max: bool
):
    t = pl.program_id(0)
    tile = data_ref.shape[0]
    r = out_ref.shape[0]
    rows2 = local_rows_ref[:]  # [agg_tile, 1]
    neutral = -_BIG if is_max else _BIG

    prev_rb = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_start = jnp.logical_or(t == 0, tile_rb_ref[t] != prev_rb)

    # Segmented prefix extremum over sorted runs via log-step shifts.
    v = data_ref[:].astype(jnp.float32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    combine = jnp.maximum if is_max else jnp.minimum
    for k in range(int(math.log2(tile))):
        s = 1 << k
        v_sh = pltpu.roll(v, shift=s, axis=0)
        r_sh = pltpu.roll(rows2, shift=s, axis=0)
        valid = jnp.logical_and(pos >= s, r_sh == rows2)
        v = combine(v, jnp.where(valid, v_sh, jnp.float32(neutral)))

    # Last edge of each run now holds the full-run extremum.
    nxt = pltpu.roll(rows2, shift=tile - 1, axis=0)  # circular -1
    last = jnp.logical_or(nxt != rows2, pos == tile - 1)
    real = rows2 < r
    mark = jnp.logical_and(last, real)

    # Non-marked positions contribute zeros, so the unmasked one-hot matmul
    # sums exactly one (run-extremum) value per output row.
    markf = mark.astype(jnp.float32)
    marked = jnp.concatenate([jnp.where(mark, v, 0.0), markf], axis=1)  # [tile, D+1]

    # bf16 inputs: every marked value is a run extremum of bf16 data (max/
    # select only, no arithmetic), so it is bf16-exact and the selection
    # matmul could run as ONE default-precision bf16 MXU pass with f32
    # accumulation — the same dtype/precision combo as the sum kernel. On
    # this v5e toolchain that variant HANGS Mosaic at compile (the third
    # extremum-matmul dtype change to do so; see ROUND_NOTES.md), so it is
    # gated off; f32 HIGHEST (6 passes, exact) is the production path.
    if data_ref.dtype == jnp.bfloat16 and _use_bf16_selection():
        marked = marked.astype(jnp.bfloat16)
        sel_precision = jax.lax.Precision.DEFAULT
    else:
        sel_precision = jax.lax.Precision.HIGHEST

    onehot_t = (
        jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) == rows_row_ref[0:1, :]
    ).astype(marked.dtype)  # [R, agg_tile]

    sel = jax.lax.dot_general(
        onehot_t,
        marked,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=sel_precision,
    )  # [R, D+1]; last column = presence count (0 or 1)
    contrib = sel[:, :-1]
    present = sel[:, -1:] > 0

    @pl.when(is_start)
    def _():
        out_ref[:] = jnp.where(present, contrib, jnp.float32(neutral))

    @pl.when(jnp.logical_not(is_start))
    def _():
        out_ref[:] = jnp.where(present, combine(out_ref[:], contrib), out_ref[:])


def _run_kernel(kernel_body, plan: AggregationPlan, data_sorted: jax.Array) -> jax.Array:
    num_tiles = plan.tile_row_blocks.shape[0]
    agg_tile = plan.local_rows.shape[0] // num_tiles
    num_row_blocks, r = plan.counts.shape
    d = data_sorted.shape[1]

    needs_cols = kernel_body is not _sum_kernel
    in_specs = []
    args = []
    if needs_cols:  # extremum kernels use the column layout for shift logic
        in_specs.append(
            pl.BlockSpec((agg_tile, 1), lambda t, rb: (t, 0), memory_space=pltpu.VMEM)
        )
        args.append(plan.local_rows)
    in_specs.append(
        pl.BlockSpec((8, agg_tile), lambda t, rb: (t, 0), memory_space=pltpu.VMEM)
    )
    args.append(rows_row_operand(plan))
    in_specs.append(
        pl.BlockSpec((agg_tile, d), lambda t, rb: (t, 0), memory_space=pltpu.VMEM)
    )
    args.append(data_sorted)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tile_row_blocks
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, d), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel_body,
        out_shape=jax.ShapeDtypeStruct((num_row_blocks * r, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * agg_tile * r * d,
            bytes_accessed=num_tiles * agg_tile * d * 4 + num_row_blocks * r * d * 4,
            transcendentals=0,
        ),
    )(plan.tile_row_blocks, *args)
    return out


def _gather_sorted(data: jax.Array, plan: AggregationPlan, fill: float) -> jax.Array:
    """[E, D] edge data -> receiver-sorted [E_sorted, D] (padding -> fill).
    Identity when the data is already in plan order (perm is None)."""
    if plan.perm is None:
        return data
    return jnp.take(data, plan.perm, axis=0, mode="fill", fill_value=fill)


# ---------------------------------------------------------------------------
# Public ops with custom VJPs
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def planned_segment_sum(data, receivers, plan, num_nodes: int):
    """Segment sum over [E, D] data via the sorted one-hot-matmul kernel.

    ``data`` must already be zero at masked edges. ``receivers`` is only used
    by the backward gather.
    """
    data_sorted = _gather_sorted(data, plan, 0.0)
    out = _run_kernel(_sum_kernel, plan, data_sorted)
    return out[:num_nodes]


def _planned_sum_fwd(data, receivers, plan, num_nodes):
    return planned_segment_sum(data, receivers, plan, num_nodes), (
        receivers,
        _planned_sum_fwd_res_plan(plan),
    )


def _planned_sum_fwd_res_plan(plan):
    """Plans in identity order (the unified layout) let the backward use the
    block-local broadcast kernel; permuted plans would emit plan order, not
    edge order, so they keep the XLA gather."""
    return plan if plan.perm is None else None


def _broadcast_eligible(plan, dtype) -> bool:
    """The ONE predicate for routing a receiver-keyed lookup through the
    broadcast kernel: identity-order plan (block-local rows), a Mosaic
    dtype, and a plan tile large enough to beat the grid overhead
    (_broadcast_min_tile). Shared by the sum/extremum VJPs and
    adjacency_broadcast_to_edges so the three paths cannot drift."""
    return (
        plan is not None
        and plan.perm is None
        and dtype in (jnp.float32, jnp.bfloat16)
        and plan.local_rows.shape[0] // plan.tile_row_blocks.shape[0]
        >= _broadcast_min_tile()
    )


def _planned_sum_bwd(num_nodes, res, g):
    receivers, plan = res
    if _broadcast_eligible(plan, g.dtype):
        g_data = planned_broadcast_to_edges(g, receivers, plan)
    else:
        g_data = jnp.take(g, receivers, axis=0, mode="fill", fill_value=0.0)
    return g_data, None, None


planned_segment_sum.defvjp(_planned_sum_fwd, _planned_sum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def planned_segment_extremum(data, receivers, plan, num_nodes: int, is_max: bool = True):
    """Segment max/min; masked edges must carry -/+_BIG in ``data``.
    Empty segments yield 0 (torch-scatter fill), handled via plan.counts."""
    data_sorted = _gather_sorted(data, plan, -_BIG if is_max else _BIG)
    kernel = functools.partial(_extremum_kernel, is_max=is_max)
    out = _run_kernel(kernel, plan, data_sorted)
    out = out[:num_nodes]
    counts = plan.counts.reshape(-1)[:num_nodes]
    empty = counts[:, None] == 0
    # All-contributions-masked rows also read as +/-_BIG; treat as empty.
    # Numeric-domain assumption: legitimate inputs satisfy |x| < 1.5e38
    # (half the +/-3e38 mask sentinel) — values beyond that are
    # indistinguishable from masked fills and clamp to the torch-scatter
    # empty-segment 0. bf16/f32 activations in any trained model are far
    # below this; only pre-overflow garbage reaches the bound.
    degenerate = jnp.abs(out) >= _BIG / 2
    return jnp.where(jnp.logical_or(empty, degenerate), 0.0, out)


def _planned_ext_fwd(data, receivers, plan, num_nodes, is_max):
    out = planned_segment_extremum(data, receivers, plan, num_nodes, is_max)
    return out, (data, receivers, plan, out)


def _planned_ext_bwd(num_nodes, is_max, res, g):
    data, receivers, plan, out = res
    id_plan = _planned_sum_fwd_res_plan(plan)
    if _broadcast_eligible(id_plan, g.dtype):
        # Identity-order plan: the receiver-keyed lookups are block-local —
        # one widened broadcast (out | g) plus one for ties, instead of
        # three gathers. Padding slots read 0 rows: is_ext there compares
        # data (masked to +-_BIG on every aggregation path) against 0 ->
        # false, and their g row is 0, so their cotangent is 0 — the same
        # slots the gather path zeroed via fill values.
        d = out.shape[1]
        rows = planned_broadcast_to_edges(
            jnp.concatenate([out, g.astype(out.dtype)], axis=1), receivers, id_plan
        )
        is_ext = (data == rows[:, :d]).astype(jnp.float32)
        ties = planned_segment_sum(is_ext, receivers, id_plan, num_nodes)
        ties_per_edge = jnp.maximum(
            planned_broadcast_to_edges(ties, receivers, id_plan), 1.0
        )
        g_per_edge = rows[:, d:].astype(g.dtype)
        return is_ext * g_per_edge / ties_per_edge, None, None
    out_per_edge = jnp.take(out, receivers, axis=0, mode="fill", fill_value=_BIG)
    is_ext = (data == out_per_edge).astype(jnp.float32)
    ties = planned_segment_sum(is_ext, receivers, plan, num_nodes)
    ties_per_edge = jnp.take(
        jnp.maximum(ties, 1.0), receivers, axis=0, mode="fill", fill_value=1.0
    )
    g_per_edge = jnp.take(g, receivers, axis=0, mode="fill", fill_value=0.0)
    return is_ext * g_per_edge / ties_per_edge, None, None


planned_segment_extremum.defvjp(_planned_ext_fwd, _planned_ext_bwd)


def planned_segment_reduce(
    data: jax.Array,
    receivers: jax.Array,
    plan: AggregationPlan,
    num_nodes: int,
    reduction: str,
    mask: Optional[jax.Array] = None,
    counts_exact: bool = False,
) -> jax.Array:
    """torch-scatter-compatible reduce over the fast path. Accumulates in
    fp32 and casts back to data's dtype (AMP-safe, like ops.segment).

    ``counts_exact``: the mask is the batch's STATIC edge mask, so
    ``plan.counts`` already holds the per-node masked degree — mean skips
    the extra full-grid counting pass it otherwise needs for runtime masks
    (edge dropout)."""
    orig_dtype = data.dtype
    # bf16 stays bf16 through the gather and kernel input (half the HBM
    # traffic); accumulation is f32 either way.
    if data.dtype not in (jnp.float32, jnp.bfloat16):
        data = data.astype(jnp.float32)
    if reduction in ("sum", "add", "mean"):
        if mask is not None:
            data = jnp.where(mask[:, None], data, jnp.zeros((), data.dtype))
        out = planned_segment_sum(data, receivers, plan, num_nodes)
        if reduction == "mean":
            if mask is None or counts_exact:
                counts = plan.counts.reshape(-1)[:num_nodes].astype(jnp.float32)
            else:
                # Runtime masks (edge dropout) change the divisor; count the
                # surviving edges with the same kernel.
                ones = jax.lax.stop_gradient(
                    jnp.broadcast_to(mask[:, None].astype(jnp.float32), (mask.shape[0], 8))
                )
                counts = planned_segment_sum(ones, receivers, plan, num_nodes)[:, 0]
            out = out / jnp.maximum(counts, 1.0)[:, None]
    elif reduction in ("max", "min"):
        is_max = reduction == "max"
        neutral = -_BIG if is_max else _BIG
        if data.dtype == jnp.bfloat16:
            neutral = float(jnp.finfo(jnp.bfloat16).min if is_max else jnp.finfo(jnp.bfloat16).max)
        if mask is not None:
            data = jnp.where(mask[:, None], data, jnp.asarray(neutral, data.dtype))
        out = planned_segment_extremum(data, receivers, plan, num_nodes, is_max)
    else:
        raise ValueError(f"Unknown reduction '{reduction}'")
    return out.astype(orig_dtype)


def plan_from_adjacency(adj) -> AggregationPlan:
    """View an AdjacencyStruct's precomputed layout (graph/batching.py) as an
    identity-order AggregationPlan at EDGE-TILE granularity (the layout's
    type-pure, receiver-sorted tiles — required by the extremum kernels)."""
    return AggregationPlan(
        perm=None,
        local_rows=adj.local_rows,
        local_rows_row=adj.local_rows_row,
        tile_row_blocks=adj.tile_row_blocks,
        counts=adj.agg_counts,
    )


def sum_plan_from_adjacency(adj) -> AggregationPlan:
    """Identity-order plan at SUPERTILE granularity when the batcher aligned
    row-block runs (AdjacencyStruct.super_tile_row_blocks). Sum/mean need no
    receiver sortedness inside a tile — the one-hot matmul routes arbitrary
    rows — so the sum kernel walks agg_sum_tile-edge tiles (fewer grid
    steps). Falls back to the edge-tile plan when unaligned."""
    if adj.super_tile_row_blocks is None:
        return plan_from_adjacency(adj)
    return AggregationPlan(
        perm=None,
        local_rows=adj.local_rows,
        local_rows_row=adj.local_rows_row_super,
        tile_row_blocks=adj.super_tile_row_blocks,
        counts=adj.agg_counts,
    )


def adjacency_segment_reduce(
    data: jax.Array,
    adj,
    num_nodes: int,
    reduction: str,
    mask: Optional[jax.Array] = None,
    counts_exact: bool = False,
) -> jax.Array:
    """Fast masked segment reduce over a batch's unified edge layout.

    ``data``: [E_pad, ...] per-edge values in edge-slot order. Trailing dims
    are flattened for the kernel and restored after. Sum/mean run on the
    supertile plan when the batch layout is aligned; max/min need the
    receiver-sorted edge tiles.
    """
    if reduction in ("sum", "add", "mean"):
        plan = sum_plan_from_adjacency(adj)
    else:
        plan = plan_from_adjacency(adj)
    trailing = data.shape[1:]
    if data.ndim != 2:
        data = data.reshape(data.shape[0], -1)
    out = planned_segment_reduce(
        data, adj.receivers, plan, num_nodes, reduction, mask, counts_exact
    )
    if trailing != out.shape[1:]:
        out = out.reshape((num_nodes,) + trailing)
    return out


# ---------------------------------------------------------------------------
# Argmax-carrying extremum (single-winner routing)
# ---------------------------------------------------------------------------
# Carrying the winning edge slot per (node, feature) lets the max/min
# backward route cotangents with pure gathers — no tie-count kernel pass and
# no message recomputation (ops/fused_mp.py). Single-winner (first
# occurrence) semantics match torch-scatter's argmax routing, which is what
# the reference trains with.


def _extremum_argmax_kernel(
    tile_rb_ref, local_rows_ref, rows_row_ref, data_ref, out_val_ref, out_arg_ref,
    *, is_max: bool
):
    t = pl.program_id(0)
    tile = data_ref.shape[0]
    r = out_val_ref.shape[0]
    d = data_ref.shape[1]
    rows2 = local_rows_ref[:]
    neutral = -_BIG if is_max else _BIG

    prev_rb = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_start = jnp.logical_or(t == 0, tile_rb_ref[t] != prev_rb)

    v = data_ref[:].astype(jnp.float32)
    base = (t * tile).astype(jnp.float32) if hasattr(t, "astype") else t * tile
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, d), 0).astype(jnp.float32)
        + base
    )  # global slot per row (broadcast over features)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    better_op = (lambda a, b: a >= b) if is_max else (lambda a, b: a <= b)
    for k in range(int(math.log2(tile))):
        s_ = 1 << k
        v_sh = pltpu.roll(v, shift=s_, axis=0)
        i_sh = pltpu.roll(idx, shift=s_, axis=0)
        r_sh = pltpu.roll(rows2, shift=s_, axis=0)
        valid = jnp.logical_and(pos >= s_, r_sh == rows2)
        # shifted elements are EARLIER slots; >= keeps first occurrence on ties
        take_sh = jnp.logical_and(valid, better_op(v_sh, v))
        v = jnp.where(take_sh, v_sh, v)
        idx = jnp.where(take_sh, i_sh, idx)
    nxt = pltpu.roll(rows2, shift=tile - 1, axis=0)
    last = jnp.logical_or(nxt != rows2, pos == tile - 1)
    mark = jnp.logical_and(last, rows2 < r)
    marked = jnp.concatenate(
        [jnp.where(mark, v, 0.0), jnp.where(mark, idx, 0.0),
         mark.astype(jnp.float32)], axis=1
    )  # [tile, 2D + 1]
    onehot_t = (
        jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) == rows_row_ref[0:1, :]
    ).astype(jnp.float32)
    sel = jax.lax.dot_general(
        onehot_t, marked, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, 2D + 1]
    c_val = sel[:, :d]
    c_idx = sel[:, d : 2 * d]
    present = sel[:, -1:] > 0
    strictly = (lambda a, b: a > b) if is_max else (lambda a, b: a < b)

    @pl.when(is_start)
    def _():
        out_val_ref[:] = jnp.where(present, c_val, jnp.float32(neutral))
        out_arg_ref[:] = jnp.where(present, c_idx, -1.0)

    @pl.when(jnp.logical_not(is_start))
    def _():
        # earlier tiles hold earlier slots; strict compare keeps first winner
        win = jnp.logical_and(present, strictly(c_val, out_val_ref[:]))
        out_val_ref[:] = jnp.where(win, c_val, out_val_ref[:])
        out_arg_ref[:] = jnp.where(win, c_idx, out_arg_ref[:])


def planned_segment_extremum_with_argmax(
    data, receivers, plan, num_nodes: int, is_max: bool = True
):
    """Like planned_segment_extremum, but also returns the winning edge slot
    per (node, feature) ([num_nodes, D] int32, -1 for empty). Not
    differentiated directly — callers implement routing themselves."""
    del receivers
    # Slot ids travel through the f32 selection matmul: above 2^24 they lose
    # integer precision and the single-winner backward routes cotangents to
    # the wrong edge. Fail loudly instead.
    assert plan.local_rows.shape[0] < (1 << 24), (
        f"argmax routing supports < 2^24 edge slots "
        f"(got {plan.local_rows.shape[0]}): f32 index carriage"
    )
    num_tiles = plan.tile_row_blocks.shape[0]
    agg_tile = plan.local_rows.shape[0] // num_tiles
    num_row_blocks, r = plan.counts.shape
    data_sorted = _gather_sorted(data, plan, -_BIG if is_max else _BIG)
    d = data_sorted.shape[1]

    kernel = functools.partial(_extremum_argmax_kernel, is_max=is_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((agg_tile, 1), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, agg_tile), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((agg_tile, d), lambda t, rb: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, d), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda t, rb: (rb[t], 0), memory_space=pltpu.VMEM),
        ),
    )
    vals, args = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_row_blocks * r, d), jnp.float32),
            jax.ShapeDtypeStruct((num_row_blocks * r, d), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(plan.tile_row_blocks, plan.local_rows, rows_row_operand(plan), data_sorted)
    vals = vals[:num_nodes]
    args = args[:num_nodes].astype(jnp.int32)
    counts = plan.counts.reshape(-1)[:num_nodes]
    empty = counts[:, None] == 0
    degenerate = jnp.abs(vals) >= _BIG / 2
    invalid = jnp.logical_or(empty, degenerate)
    vals = jnp.where(invalid, 0.0, vals)
    args = jnp.where(invalid, -1, args)
    return vals, args


