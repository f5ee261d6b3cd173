"""Edge-partitioned model parallelism: scale one graph batch across chips.

The reference has no long-context/sequence-parallel analogue — graphs larger
than one device's budget are simply dropped (SURVEY.md §5). Here the
flattened batch graph itself is partitioned: the padded edge array (the
unified layout, graph/batching.py) is split into contiguous shards along an
``edge`` mesh axis, node states are replicated along that axis, and each
message-passing layer becomes

    per-shard: gather sources -> typed matmul -> masked segment reduce
    cross-shard: one ``psum`` (sum/mean) or ``pmax``/``pmin`` (extrema)
                 over the edge axis — the boundary-feature exchange, ridden
                 over ICI as a single fused collective per layer.

Because the layout's tiles are type- and row-block-pure, any contiguous cut
at tile granularity keeps every shard a valid mini-layout; the batcher needs
no changes — shards are views. The hybrid data x model 2D mesh (data-
parallel across batches, model-parallel within one) is implemented in its
node-sharded form: ``NodeParallel(data_axis=...)`` and
``NodeShardedModelTrainer`` (parallel/node_sharding.py,
parallel/node_sharded_trainer.py) — preferred over edge sharding for that
composition because node sharding also splits the node arrays and
exchanges only boundary rows.

Partial-aggregate semantics across shards:
* sum/mean: local masked segment_sum, psum; mean divides by global counts;
* max/min: local masked extremum with neutral fill, lax.pmax/pmin, then
  empty segments reset to 0 (torch-scatter fill) using global counts.
"""
from __future__ import annotations

import functools

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.structs import AdjacencyStruct
from ptgnn_tpu.ops.segment import segment_count, segment_reduce, segment_sum

_BIG = 3.0e38


def shard_adjacency(adj: AdjacencyStruct, num_shards: int):
    """Split the padded edge arrays into ``num_shards`` contiguous tile-
    aligned shards (host- or trace-side; arrays only). Returns an
    AdjacencyStruct with a leading shard axis on every edge-indexed field."""
    e_pad = adj.senders.shape[0]
    tile = adj.edge_tile
    n_tiles = adj.tile_types.shape[0]
    assert n_tiles % num_shards == 0, (
        f"edge tiles ({n_tiles}) must divide the edge-shard count ({num_shards}); "
        "pick max_edge_slots as a multiple of num_shards * edge_tile"
    )
    tiles_per = n_tiles // num_shards
    per = tiles_per * tile

    def split_edges(x):
        return None if x is None else x.reshape((num_shards, per) + x.shape[1:])

    def split_tiles(x):
        return None if x is None else x.reshape((num_shards, tiles_per) + x.shape[1:])

    return AdjacencyStruct(
        senders=split_edges(adj.senders),
        receivers=split_edges(adj.receivers),
        edge_types=split_edges(adj.edge_types),
        tile_types=split_tiles(adj.tile_types),
        mask=split_edges(adj.mask),
        tile_types_transposed=split_tiles(adj.tile_types_transposed),
        local_rows=None if adj.local_rows is None else adj.local_rows.reshape(
            num_shards, per, 1
        ),
        local_rows_row=None
        if adj.local_rows_row is None
        else adj.local_rows_row.reshape(num_shards, tiles_per * 8, tile),
        # Supertile plan fields would need supertile-aligned cuts; shards
        # fall back to the edge-tile plan (sharded aggregate uses XLA ops),
        # so BOTH supertile fields are dropped — the sum plan requires the
        # pair together.
        local_rows_row_super=None,
        tile_row_blocks=split_tiles(adj.tile_row_blocks),
        super_tile_row_blocks=None,
        # counts are global (per node); replicate per shard for mean/extrema.
        agg_counts=adj.agg_counts,
        # edge-indexed like senders; feature payloads stay replicated.
        edge_feature_slot=split_edges(adj.edge_feature_slot),
    )


def sharded_aggregate(
    messages: jax.Array,  # [E_local, M] this shard's messages
    local_adj: AdjacencyStruct,  # this shard's slice (local arrays)
    num_nodes: int,
    reduction: str,
    axis_name: str,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Local masked segment reduce + one collective over the edge axis.

    Call inside shard_map with ``axis_name`` mapped over the edge shards.
    Each shard is a contiguous tile-aligned slice of the unified layout, so
    when the batch carries an aggregation plan the local reduce runs the
    sorted-segment Pallas kernel (edge-tile grid; supertile fields do not
    survive sharding) — the XLA segment ops remain the fallback.
    """
    from ptgnn_tpu.graph.messagepassing.base import _use_pallas_aggregation
    from ptgnn_tpu.ops.pallas.segment_kernels import adjacency_segment_reduce

    mask = mask if mask is not None else local_adj.mask
    use_plan = local_adj.has_aggregation_plan and _use_pallas_aggregation()
    if reduction in ("sum", "add", "mean"):
        if use_plan:
            local = adjacency_segment_reduce(
                messages, local_adj, num_nodes, "sum", mask=mask
            )
            # A shard's tiles cover only its own row blocks; output blocks
            # no local tile maps to are uninitialized kernel memory (the
            # full-batch layout guarantees coverage, a shard slice doesn't).
            # Zero them before they poison the psum.
            local = _zero_uncovered_blocks(local, local_adj, num_nodes)
        else:
            local = segment_sum(messages, local_adj.receivers, num_nodes, mask)
        total = jax.lax.psum(local, axis_name)
        if reduction == "mean":
            cnt = segment_count(local_adj.receivers, num_nodes, mask).astype(total.dtype)
            cnt = jax.lax.psum(cnt, axis_name)
            total = total / jnp.maximum(cnt, 1.0)[:, None]
        return total
    if reduction in ("max", "min"):
        is_max = reduction == "max"
        neutral = -_BIG if is_max else _BIG
        if use_plan:
            local = adjacency_segment_reduce(
                messages.astype(jnp.float32), local_adj, num_nodes, reduction,
                mask=mask,
            )
        else:
            work = jnp.where(mask[:, None], messages.astype(jnp.float32), neutral)
            local = segment_reduce(
                work, local_adj.receivers, num_nodes, reduction, mask=None
            )
        # empty local segments were filled with 0 by segment_reduce; restore
        # the neutral so they lose the cross-shard combine
        cnt_l = segment_count(local_adj.receivers, num_nodes, mask)
        local = jnp.where(cnt_l[:, None] > 0, local, jnp.float32(neutral))
        total = _allreduce_extremum(local, axis_name, is_max)
        cnt = jax.lax.psum(cnt_l, axis_name)
        return jnp.where(cnt[:, None] > 0, total, 0.0).astype(messages.dtype)
    raise ValueError(f"Unknown reduction '{reduction}'")


def _zero_uncovered_blocks(out: jax.Array, adj: AdjacencyStruct, num_nodes: int):
    """Zero output rows of row blocks no local tile maps to (their kernel
    output is uninitialized). Coverage comes from the shard's tile plan."""
    num_blocks, r = adj.agg_counts.shape
    cov = (
        jnp.zeros((num_blocks,), jnp.int32)
        .at[adj.tile_row_blocks]
        .set(1, mode="drop")
    )
    cov_rows = jnp.repeat(cov, r)[:num_nodes]
    return jnp.where(cov_rows[:, None] > 0, out, jnp.zeros((), out.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _allreduce_extremum(local, axis_name: str, is_max: bool):
    """Differentiable pmax/pmin over a mesh axis.

    Streams one [N, D] reduction over ICI instead of materializing the
    all_gather's [num_shards, N, D] activation. Backward tie-splits the
    (replicated) cotangent among the shards holding the extremum — the same
    semantics as the single-device segment extremum VJP."""
    return jax.lax.pmax(local, axis_name) if is_max else jax.lax.pmin(local, axis_name)


def _allreduce_extremum_fwd(local, axis_name, is_max):
    total = _allreduce_extremum(local, axis_name, is_max)
    return total, (local, total)


def _allreduce_extremum_bwd(axis_name, is_max, res, g):
    local, total = res
    winner = (local == total).astype(jnp.float32)
    ties = jax.lax.psum(winner, axis_name)
    # The output is replicated; every shard's downstream use contributes a
    # cotangent, so the true d(local) sums them before tie-splitting.
    g_total = jax.lax.psum(g, axis_name)
    return (winner * g_total / jnp.maximum(ties, 1.0),)


_allreduce_extremum.defvjp(_allreduce_extremum_fwd, _allreduce_extremum_bwd)


class EdgeParallel:
    """Train-step builder partitioning one batch's edges across a mesh axis.

    Node states, parameters, and all non-edge batch fields are replicated
    along the axis; each layer's aggregation performs one collective
    (parallel/edge_sharding.sharded_aggregate). For the hybrid data x model
    2D mesh, use NodeParallel(data_axis=...) / NodeShardedModelTrainer
    (parallel/node_sharding.py, parallel/node_sharded_trainer.py) — the
    node-sharded form supersedes edge sharding there because it also shards
    the node arrays and exchanges only boundary rows.
    """

    def __init__(self, module, optimizer, mesh, *, axis: str = "edge",
                 enable_amp: bool = False):
        self.module = module
        self.optimizer = optimizer
        self.mesh = mesh
        self.axis = axis
        self.enable_amp = enable_amp
        self.num_shards = mesh.shape[axis]
        # Static module config: aggregations add a collective over `axis`.
        gnn = getattr(module, "gnn", None) or getattr(module, "_gnn", None)
        assert gnn is not None, "EdgeParallel needs a module exposing .gnn"
        gnn.edge_partition_axis = axis

    def shard_batch(self, minibatch: Dict[str, Any]) -> Dict[str, Any]:
        """Host-side: put the leading shard axis on the edge arrays."""
        batch = minibatch["batch"]
        return {**minibatch,
                "batch": batch._replace(
                    adjacency=shard_adjacency(batch.adjacency, self.num_shards))}

    def _specs(self, example_sharded_mb):
        from jax.sharding import PartitionSpec as P

        def batch_spec(path_leaf):
            return P(self.axis)

        # adjacency leaves sharded on their leading axis; all else replicated
        def spec_tree(mb):
            batch = mb["batch"]
            adj_spec = jax.tree_util.tree_map(lambda x: P(self.axis), batch.adjacency)
            # agg_counts stays replicated (global per-node degrees)
            adj_spec = adj_spec._replace(agg_counts=P())
            rest = jax.tree_util.tree_map(lambda x: P(), mb)
            rest["batch"] = rest["batch"]._replace(adjacency=adj_spec)
            return rest

        return spec_tree(example_sharded_mb)

    def build_train_step(self, example_sharded_mb):
        from jax.sharding import PartitionSpec as P

        axis = self.axis
        module = self.module
        optimizer = self.optimizer

        def _cast(tree, dtype):
            return jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        def per_shard_loss(params, sharded_mb, rng):
            def delead(x):
                # edge-sharded leaves arrive as [1, ...] local views
                return x[0] if x is not None else None

            batch = sharded_mb["batch"]
            local_adj = jax.tree_util.tree_map(delead, batch.adjacency)
            local_adj = local_adj._replace(agg_counts=batch.adjacency.agg_counts)
            mb = {**sharded_mb, "batch": batch._replace(adjacency=local_adj)}
            if self.enable_amp:
                params = _cast(params, jnp.bfloat16)
                mb = _cast(mb, jnp.bfloat16)
            loss, metrics = module.apply(params, **mb, train=True, rng=rng)
            return loss.astype(jnp.float32), metrics

        from ptgnn_tpu.parallel.dp import _shard_map

        in_specs = (P(), self._specs(example_sharded_mb), P())
        # Differentiate THROUGH the shard_map: its transpose for replicated
        # (P()) inputs psums each shard's partial parameter gradient, which
        # is exactly the sum-over-edges semantics of message passing.
        sharded_loss = _shard_map(
            per_shard_loss, mesh=self.mesh, in_specs=in_specs, out_specs=(P(), P())
        )

        def train_step(params, opt_state, sharded_mb, rng):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: sharded_loss(p, sharded_mb, rng), has_aux=True
            )(params)
            grads = _cast(grads, jnp.float32)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, metrics

        return jax.jit(train_step, donate_argnums=(0, 1))
