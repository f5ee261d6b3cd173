"""Transformer-style self-attention among nodes of the same graph.

Re-design of the reference's MultiHeadSelfAttentionMessagePassing
(ptgnn/neuralmodels/gnn/messagepassing/selfattmessagepassing.py:9-136).
The reference Python-loops over graphs and chunks each graph's nodes into
windows of ``max_num_nodes=250``, computing dense attention inside each
window. That loop is data-dependent and host-driven — hostile to XLA.

TPU-first formulation: the flattened node axis is reshaped into fixed blocks
of ``block_size`` rows and attention runs **block-diagonally** with a
same-graph mask inside every block — one batched einsum over
[num_blocks, block, ...] that the MXU tiles directly, no host loop, no
dynamic shapes. Like the reference's chunking this is an approximation for
graphs larger than one block (nodes attend only within their block); for
graphs that fit inside a block and do not straddle a block boundary it is
exact full-graph attention. Padding rows are masked from both sides of the
softmax and produce zero attention output.

``target_reference`` restricts attention to a named reference-node subset and
writes results back in place (selfattmessagepassing.py:86-90,124-128); the
gathered subset occupies few rows, so it uses the same block kernel.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer, GraphContext
from ptgnn_tpu.nn.layers import LayerNorm, Linear, dropout
from ptgnn_tpu.nn.module import Params, fold


def _block_attention(
    qkv: jax.Array,  # [N, heads, 2*kd + vd]
    graph_ids: jax.Array,  # [N]
    valid: jax.Array,  # [N] bool
    *,
    key_dim: int,
    block_size: int,
    dropout_rate: float,
    train: bool,
    rng: Optional[jax.Array],
) -> jax.Array:
    """Block-diagonal same-graph attention. Returns [N, heads, vd]."""
    n, heads, _ = qkv.shape
    assert n % block_size == 0, (n, block_size)
    nb = n // block_size
    keys = qkv[:, :, :key_dim].reshape(nb, block_size, heads, key_dim)
    queries = qkv[:, :, key_dim : 2 * key_dim].reshape(nb, block_size, heads, key_dim)
    values = qkv[:, :, 2 * key_dim :].reshape(nb, block_size, heads, -1)

    # Reference scoring (selfattmessagepassing.py:105-115): row i's output
    # mixes values weighted by softmax_j(keys[i] . queries[j]).
    scores = jnp.einsum("bkhd,bvhd->bhkv", keys, queries) / (key_dim**0.5)

    gid = graph_ids.reshape(nb, block_size)
    vld = valid.reshape(nb, block_size)
    same_graph = gid[:, :, None] == gid[:, None, :]  # [nb, k, v]
    attend = jnp.logical_and(
        same_graph, jnp.logical_and(vld[:, :, None], vld[:, None, :])
    )[:, None, :, :]  # [nb, 1, k, v]

    neg_inf = jnp.finfo(scores.dtype).min
    scores = jnp.where(attend, scores, neg_inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # Rows with no valid target (padding nodes): zero output, no NaNs.
    probs = jnp.where(attend.any(axis=-1, keepdims=True), probs, jnp.zeros((), probs.dtype))
    probs = dropout(rng, probs, dropout_rate, train)
    out = jnp.einsum("bhkv,bvhd->bkhd", probs, values)
    return out.reshape(n, heads, -1)


class MultiHeadSelfAttentionMessagePassing(AbstractMessagePassingLayer):
    # Attention runs over the batcher's global att_order packing, which a
    # receiver-aligned node shard cannot see locally. Under node sharding the
    # layer therefore all_gathers the (small, [N, D]) node states, attends
    # over the GLOBAL packing — bit-identical to the single-device path —
    # and keeps only its local rows. That one gather is O(N*D) for THIS
    # layer only; the boundary-exchange stack's O(boundary*D) scaling is
    # untouched for every other layer. It never reads the recv buffer or
    # adjacency, so the engine skips its boundary all_to_all
    # (needs_boundary_exchange contract, base.py).
    supports_node_sharding = True
    needs_boundary_exchange = False

    def __init__(
        self,
        input_state_dimension: int,
        key_query_dimension: int,
        value_dimension: int,
        output_dimension: int,
        intermediate_dimension: int,
        num_heads: int,
        dropout_rate: float = 0.0,
        target_reference: str = "all",
        max_num_nodes: int = 256,
    ):
        self.__input_dim = input_state_dimension
        self.__output_dim = output_dimension
        self.num_heads = num_heads
        self.key_query_dim = key_query_dimension
        self.value_dim = value_dimension
        self.dropout_rate = dropout_rate
        self.target_reference = target_reference
        self.block_size = max_num_nodes

        self.selfatt_head_transforms = Linear(
            input_state_dimension,
            num_heads * (2 * key_query_dimension + value_dimension),
            use_bias=False,
        )
        self.summarization_layer = Linear(
            num_heads * value_dimension, output_dimension, use_bias=False
        )
        self.intermediate_layer = Linear(output_dimension, intermediate_dimension)
        self.output_layer = Linear(intermediate_dimension, output_dimension)
        self.layer_norm1 = LayerNorm(output_dimension)
        self.layer_norm2 = LayerNorm(output_dimension)

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 6)
        return {
            "head_transforms": self.selfatt_head_transforms.init(ks[0]),
            "summarization": self.summarization_layer.init(ks[1]),
            "intermediate": self.intermediate_layer.init(ks[2]),
            "output": self.output_layer.init(ks[3]),
            "layer_norm1": self.layer_norm1.init(ks[4]),
            "layer_norm2": self.layer_norm2.init(ks[5]),
        }

    def apply(
        self,
        params: Params,
        node_states: jax.Array,
        ctx: GraphContext,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        ns = ctx.node_sharding
        if ns is not None:
            # Gather the global node states, attend over the global packing
            # (exact — identical to the single-device computation), keep the
            # local rows. See the class comment for the cost model. This
            # covers target_reference subsets too: reference sets carry
            # GLOBAL node ids (parallel/node_sharding.py remaps them through
            # the reorder permutation), so the recursive unsharded call
            # gathers the reference rows straight out of the gathered table
            # and writes them back in place before the local slice.
            h_global = jax.lax.all_gather(ns.h_local, ns.axis, tiled=True)
            global_ctx = ctx._replace(
                node_graph=ns.node_graph_global,
                node_mask=ns.node_mask_global,
                att_order=ns.att_order_global,
                node_sharding=None,
            )
            out = self.apply(
                params, h_global, global_ctx, train=train, rng=rng
            )
            start = jax.lax.axis_index(ns.axis) * ns.rows_per
            local = jax.lax.dynamic_slice_in_dim(out, start, ns.rows_per, 0)
            tail = node_states.shape[0] - ns.rows_per
            return jnp.concatenate(
                [local, jnp.zeros((tail, local.shape[-1]), local.dtype)], axis=0
            )

        n = node_states.shape[0]
        order = None
        att_width = self.block_size
        if self.target_reference == "all":
            if ctx.att_order is not None:
                # Batch-provided permutation: every graph <= block occupies
                # ONE block, so block attention is exact for it (the
                # reference's chunk semantics). Gather rows, attend, scatter
                # the updated rows back. The attention window is the
                # BATCHER's block width — if it differs from this layer's
                # max_num_nodes, honor the packing (exactness needs
                # one-graph-per-block) and say so once instead of silently
                # reverting to graph-straddling approximation.
                att_width = ctx.att_order.shape[1]
                if att_width != self.block_size and not getattr(
                    self, "_att_width_warned", False
                ):
                    import logging

                    logging.getLogger(__name__).warning(
                        "Self-attention layer max_num_nodes=%d but the batch "
                        "packs attention blocks of %d nodes; using the "
                        "batch's block width (set BatchPadding.att_block to "
                        "match the layer to silence this).",
                        self.block_size,
                        att_width,
                    )
                    self._att_width_warned = True
                order = ctx.att_order.reshape(-1)
                safe = jnp.minimum(order, n - 1)
                in_range = order < n
                relevant = jnp.take(node_states, safe, axis=0)
                graph_ids = jnp.where(
                    in_range,
                    jnp.take(ctx.node_graph, safe, axis=0),
                    jnp.full((), -1, ctx.node_graph.dtype),
                )
                valid = jnp.logical_and(
                    in_range, jnp.take(ctx.node_mask, safe, axis=0)
                )
            else:
                relevant = node_states
                graph_ids = ctx.node_graph
                valid = ctx.node_mask
        else:
            ref = ctx.references[self.target_reference]
            relevant = jnp.take(node_states, ref.node_ids, axis=0)
            graph_ids = jnp.where(ref.mask, ref.graph_ids, jnp.full((), -1, ref.graph_ids.dtype))
            valid = ref.mask

        r = relevant.shape[0]
        block = min(att_width, r)
        pad = (-r) % block
        if pad:
            relevant_p = jnp.pad(relevant, ((0, pad), (0, 0)))
            graph_ids_p = jnp.pad(graph_ids, (0, pad), constant_values=-1)
            valid_p = jnp.pad(valid, (0, pad), constant_values=False)
        else:
            relevant_p, graph_ids_p, valid_p = relevant, graph_ids, valid

        qkv = self.selfatt_head_transforms.apply(params["head_transforms"], relevant_p)
        qkv = qkv.reshape(relevant_p.shape[0], self.num_heads, -1)
        att = _block_attention(
            qkv,
            graph_ids_p,
            valid_p,
            key_dim=self.key_query_dim,
            block_size=block,
            dropout_rate=self.dropout_rate,
            train=train,
            rng=fold(rng, 0),
        )[:r]  # [r, heads, vd]

        output = self.summarization_layer.apply(
            params["summarization"], att.reshape(r, -1)
        )
        output = dropout(fold(rng, 1), output, self.dropout_rate, train)
        attention_output = self.layer_norm1.apply(params["layer_norm1"], output + relevant)

        intermediate = jax.nn.relu(
            self.intermediate_layer.apply(params["intermediate"], attention_output)
        )
        out = dropout(
            fold(rng, 2), self.output_layer.apply(params["output"], intermediate),
            self.dropout_rate, train,
        )
        output_node_states = self.layer_norm2.apply(params["layer_norm2"], out + attention_output)

        if self.target_reference == "all":
            if order is None:
                return output_node_states
            # Scatter permuted rows back; padding slots (order >= n) drop.
            return (
                jnp.zeros_like(output_node_states, shape=(n,) + output_node_states.shape[1:])
                .at[order]
                .set(output_node_states, mode="drop")
            )
        # Write the updated reference rows back in place; padding rows are
        # routed to an out-of-range index and dropped.
        ref = ctx.references[self.target_reference]
        safe_ids = jnp.where(ref.mask, ref.node_ids, jnp.full((), n, ref.node_ids.dtype))
        return node_states.at[safe_ids].set(
            output_node_states.astype(node_states.dtype), mode="drop"
        )

    @property
    def input_state_dimension(self) -> int:
        return self.__input_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__output_dim
