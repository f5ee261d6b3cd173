"""Message-passing layer interface over the fused, type-blocked edge layout.

The reference interface passes per-type adjacency lists and Python-loops over
them (abstractmessagepassing.py:8-60); here a layer receives one
``GraphContext`` holding the fused AdjacencyStruct plus per-graph structure,
and aggregates with the masked segment ops (the torch-scatter replacement).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax

from ptgnn_tpu.nn.module import Module, Params
from ptgnn_tpu.ops.segment import segment_reduce
from ptgnn_tpu.graph.structs import AdjacencyStruct, ReferenceSet


def _use_pallas_aggregation() -> bool:
    """Pallas aggregation runs on real TPU backends only; the CPU interpreter
    is orders of magnitude slower than XLA's segment ops. Override with
    PTGNN_TPU_FORCE_PALLAS_AGG=0/1."""
    import os

    override = os.environ.get("PTGNN_TPU_FORCE_PALLAS_AGG")
    if override is not None:
        return override not in ("0", "false", "")
    import jax

    return jax.default_backend() == "tpu"


class GraphContext(NamedTuple):
    """Everything a message-passing layer may need besides node states."""

    adjacency: AdjacencyStruct
    edge_features: Optional[Any]  # [E_pad, F] or None
    node_graph: Any  # [N_pad] int32 (padding -> max_graphs, dropped)
    node_mask: Any  # [N_pad] bool
    graph_mask: Any  # [G_pad] bool
    references: Dict[str, ReferenceSet]
    # False when runtime edge dropout replaced the static batch mask; the
    # scatter-free fused backward (ops/fused_mp.py) requires the static mask.
    edge_mask_is_static: bool = True
    # Mesh axis name when the edge array is partitioned across devices
    # (parallel/edge_sharding.py); aggregations then add one collective.
    edge_axis: Any = None
    # [n_blocks, att_block] node permutation for exact block-diagonal
    # self-attention (graph/batching.py), or None.
    att_order: Any = None
    # NodeShardCtx when the batch is receiver-aligned node-sharded
    # (parallel/node_sharding.py): node_states is then the extended
    # [rows_per + S*b] buffer (local rows ++ boundary recv), ctx.adjacency
    # the plan-less merged layout over it, and the single-linear fused seam
    # routes through the overlapped interior/boundary split.
    node_sharding: Any = None

    @property
    def max_graphs(self) -> int:
        return self.graph_mask.shape[0]


def masked_segment_aggregate(
    messages: jax.Array, ctx: "GraphContext", num_nodes: int, reduction: str
) -> jax.Array:
    """Masked segment reduce of per-edge values to receiver nodes — THE
    aggregation dispatch, shared by the layer base class and pluggable
    aggregators (PNA): edge-partitioned batches add one collective over the
    edge axis; batches in the unified layout run the sorted-segment Pallas
    kernel on TPU; XLA segment ops otherwise."""
    adj = ctx.adjacency
    if ctx.edge_axis is not None:
        from ptgnn_tpu.parallel.edge_sharding import sharded_aggregate

        return sharded_aggregate(
            messages, adj, num_nodes, reduction, ctx.edge_axis, mask=adj.mask
        )
    if (
        adj.has_aggregation_plan
        and reduction in ("sum", "add", "mean", "max", "min")
        and _use_pallas_aggregation()
    ):
        from ptgnn_tpu.ops.pallas.segment_kernels import adjacency_segment_reduce

        return adjacency_segment_reduce(
            messages, adj, num_nodes, reduction, mask=adj.mask,
            # Static batch mask -> plan.counts already hold the masked
            # degrees; mean skips its extra counting pass. Edge dropout
            # flips edge_mask_is_static off (graph/gnn.py).
            counts_exact=ctx.edge_mask_is_static,
        )
    return segment_reduce(
        messages,
        adj.receivers,
        num_segments=num_nodes,
        reduction=reduction,
        mask=adj.mask,
    )


def masked_segment_degree(ctx: "GraphContext", num_nodes: int) -> jax.Array:
    """[N] masked in-degree; global (psum) under edge partitioning."""
    from ptgnn_tpu.ops.segment import segment_count

    cnt = segment_count(ctx.adjacency.receivers, num_nodes, ctx.adjacency.mask)
    if ctx.edge_axis is not None:
        cnt = jax.lax.psum(cnt, ctx.edge_axis)
    return cnt


def fused_linear_message_aggregation_or_none(
    weight_stack,
    node_states,
    ctx: "GraphContext",
    *,
    reduction,
    use_target_state: bool,
    dropout_rate: float,
    train: bool,
    rng,
):
    """Scatter-free fused message+aggregate (ops/fused_mp.py) when the batch
    layout and layer configuration allow it; None -> caller falls back."""
    if not isinstance(reduction, str) or reduction not in (
        "sum", "add", "mean", "max", "min",
    ):
        return None
    if ctx.edge_features is not None:
        return None
    if ctx.node_sharding is not None:
        # Node-sharded hot path: interior/boundary split with the boundary
        # all_to_all overlapping interior compute.
        from ptgnn_tpu.parallel.node_sharding import (
            node_sharded_linear_message_aggregation,
        )

        return node_sharded_linear_message_aggregation(
            weight_stack, ctx, reduction=reduction,
            use_target_state=use_target_state, dropout_rate=dropout_rate,
            train=train, rng=rng,
        )
    if ctx.edge_axis is not None:
        return None
    if not _use_pallas_aggregation():
        return None
    from ptgnn_tpu.ops.fused_mp import can_fuse, fused_typed_message_aggregation

    if not can_fuse(ctx.adjacency, ctx.edge_mask_is_static):
        return None
    keep = 1.0 - (dropout_rate if train else 0.0)
    seed = None
    if keep < 1.0:
        import jax.numpy as jnp

        seed = jax.random.bits(rng, dtype=jnp.uint32)
    return fused_typed_message_aggregation(
        node_states,
        weight_stack,
        (ctx.adjacency, seed),
        node_states.shape[0],
        reduction,
        use_target_state,
        keep,
    )


class AbstractMessagePassingLayer(Module):
    """apply(params, node_states [N,D], ctx) -> [N, D'] output node states."""

    # Under node sharding: does this layer read cross-shard SENDER features
    # (adjacency/recv buffer)? Layers that only use per-graph statistics
    # (GraphNorm) or all_gather their own view (global exchange) set this
    # False and the engine skips their boundary all_to_all entirely.
    # CONTRACT for False-setting layers: the engine still hands them a
    # merged ctx.adjacency whose boundary senders point at a ZEROED recv
    # buffer (gnn.py node-sharded stack) — a False layer must therefore not
    # read ctx.adjacency or ctx.node_sharding.recv at all, or it would
    # silently aggregate zeros in place of real cross-shard features.
    needs_boundary_exchange: bool = True

    def apply(
        self,
        params: Params,
        node_states: jax.Array,
        ctx: GraphContext,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        raise NotImplementedError

    def _aggregate_messages(
        self,
        messages: jax.Array,
        ctx: GraphContext,
        num_nodes: int,
        aggregation_fn: str,
    ) -> jax.Array:
        """Masked segment reduce to receivers; fp32 accumulation for low
        precision inputs (mirrors abstractmessagepassing.py:38-50)."""
        return masked_segment_aggregate(messages, ctx, num_nodes, aggregation_fn)

    @property
    def input_state_dimension(self) -> int:
        raise NotImplementedError

    @property
    def output_state_dimension(self) -> int:
        raise NotImplementedError


class AbstractMessageAggregation(Module):
    """Pluggable aggregation (reference: abstractmessagepassing.py:63-70)."""

    def apply(self, params: Params, messages: jax.Array, ctx: GraphContext, num_nodes: int):
        raise NotImplementedError

    def output_state_size(self, message_input_size: int) -> int:
        raise NotImplementedError
