"""Efficient Graph Convolution (EGC-S, Tailor et al. 2021).

Mirrors the reference (ptgnn/neuralmodels/gnn/messagepassing/
egcmessagepassing.py:8-99): per-edge-type basis projections combined by
per-node learned head x basis coefficients. The reference's per-type loop
(egcmessagepassing.py:70-84) collapses into one ``typed_tile_matmul`` over the
type-blocked edge layout, and the aggregation is a masked segment reduce over
[E, heads, bases, D/heads] messages.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer, GraphContext
from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.layers import Linear, dropout
from ptgnn_tpu.nn.module import Params, fold
from ptgnn_tpu.ops.typed_linear import typed_tile_matmul


class EGCMessagePassingLayer(AbstractMessagePassingLayer):
    def __init__(
        self,
        input_state_dimension: int,
        output_state_dimension: int,
        num_edge_types: int,
        message_aggregation_function: str,
        num_bases: int = 4,
        num_heads: int = 8,
        dropout_rate: float = 0.0,
    ):
        assert output_state_dimension % num_heads == 0
        self.__input_state_dim = input_state_dimension
        self.__output_state_dim = output_state_dimension
        self.num_edge_types = num_edge_types
        self.aggregation_fn = message_aggregation_function
        self.num_bases = num_bases
        self.num_heads = num_heads
        self.dropout_rate = dropout_rate
        # Per-node combination coefficients (torch Linear with bias).
        self.weight_coeffs = Linear(input_state_dimension, num_heads * num_bases, use_bias=True)

    def init(self, key: jax.Array) -> Params:
        kb, kc = jax.random.split(key)
        # Per-type bias-free basis Linears [B*O, D] (egcmessagepassing.py:46-52),
        # stored transposed+stacked [T, D, B*O] for the tile matmul.
        w_init = init.kaiming_uniform()
        keys = jax.random.split(kb, self.num_edge_types)
        d, b, o = self.__input_state_dim, self.num_bases, self.__output_state_dim
        bases = jnp.stack([w_init(k, (b * o, d)).T for k in keys])  # [T, D, B*O]
        return {"bases": bases, "weight_coeffs": self.weight_coeffs.init(kc)}

    def apply(
        self,
        params: Params,
        node_states: jax.Array,
        ctx: GraphContext,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        adj = ctx.adjacency
        n = node_states.shape[0]
        h, b, o = self.num_heads, self.num_bases, self.__output_state_dim

        node_weights = self.weight_coeffs.apply(
            params["weight_coeffs"], node_states
        ).reshape(n, h, b, 1)

        from ptgnn_tpu.graph.messagepassing.base import (
            fused_linear_message_aggregation_or_none,
        )

        aggregated = fused_linear_message_aggregation_or_none(
            params["bases"], node_states, ctx, reduction=self.aggregation_fn,
            use_target_state=False, dropout_rate=self.dropout_rate,
            train=train, rng=fold(rng, 0),
        )
        if aggregated is not None:
            aggregated = aggregated.reshape(n, h, b, o // h)
        else:
            source_states = jnp.take(node_states, adj.senders, axis=0)  # [E, D]
            source_states = dropout(fold(rng, 0), source_states, self.dropout_rate, train)
            base_messages = typed_tile_matmul(
                source_states, params["bases"], adj.tile_types, adj.edge_tile
            )  # [E, B*O]
            messages = base_messages.reshape(-1, h, b, o // h)

            aggregated = self._aggregate_messages(
                messages, ctx, n, self.aggregation_fn
            )  # [N, h, b, O/h]
        return (aggregated * node_weights).sum(axis=-2).reshape(n, o)

    @property
    def input_state_dimension(self) -> int:
        return self.__input_state_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__output_state_dim
