"""GGNN-style gated message passing (reference: gatedmessagepassing.py:8-77).

Per-edge-type bias-free linear messages + GRUCell state update. The per-type
Python loop of the reference becomes one ``typed_tile_matmul`` over the
type-blocked edge layout: gather source states once, batch-matmul all tiles
against their type's weight on the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer, GraphContext
from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.layers import GRUCell, dropout
from ptgnn_tpu.nn.module import Params, fold
from ptgnn_tpu.ops.typed_linear import typed_tile_matmul


class GatedMessagePassingLayer(AbstractMessagePassingLayer):
    def __init__(
        self,
        state_dimension: int,
        message_dimension: int,
        num_edge_types: int,
        message_aggregation_function: str,
        dropout_rate: float = 0.0,
        edge_feature_dimension: int = 0,
    ):
        self.state_dimension = state_dimension
        self.message_dimension = message_dimension
        self.num_edge_types = num_edge_types
        self.aggregation_fn = message_aggregation_function
        self.dropout_rate = dropout_rate
        self.edge_feature_dimension = edge_feature_dimension
        # State update inits mirror the reference exactly
        # (gatedmessagepassing.py:28-32).
        self.state_update = GRUCell(
            message_dimension,
            state_dimension,
            weight_hh_init=init.orthogonal(),
            weight_ih_init=init.xavier_uniform(),
            bias_hh_init=init.normal(std=1e-5),
            bias_ih_init=init.normal(std=1e-5),
        )

    def init(self, key: jax.Array) -> Params:
        kmsg, kgru = jax.random.split(key)
        # Per-type xavier_normal with gain (1/T)^0.5 on torch-layout [M, D+F]
        # (gatedmessagepassing.py:26-27), stored transposed+stacked [T, D+F, M].
        in_dim = self.state_dimension + self.edge_feature_dimension
        w_init = init.xavier_normal(gain=(1.0 / self.num_edge_types) ** 0.5)
        keys = jax.random.split(kmsg, self.num_edge_types)
        stacked = jnp.stack(
            [w_init(k, (self.message_dimension, in_dim)).T for k in keys]
        )  # [T, D+F, M]
        return {"message_weights": stacked, "state_update": self.state_update.init(kgru)}

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
        aggregated = None
        if self.edge_feature_dimension == 0:
            from ptgnn_tpu.graph.messagepassing.base import (
                fused_linear_message_aggregation_or_none,
            )

            aggregated = fused_linear_message_aggregation_or_none(
                params["message_weights"], node_states, ctx,
                reduction=self.aggregation_fn, use_target_state=False,
                dropout_rate=self.dropout_rate, train=train, rng=fold(rng, 0),
            )
        if aggregated is None:
            msg_input = jnp.take(node_states, adj.senders, axis=0)  # [E, D]
            if self.edge_feature_dimension > 0:
                msg_input = jnp.concatenate([msg_input, ctx.edge_features], axis=-1)
            msg_input = dropout(fold(rng, 0), msg_input, self.dropout_rate, train)
            messages = typed_tile_matmul(
                msg_input, params["message_weights"], adj.tile_types, adj.edge_tile
            )  # [E, M]
            aggregated = self._aggregate_messages(
                messages, ctx, node_states.shape[0], self.aggregation_fn
            )  # [N, M]
        return self.state_update.apply(params["state_update"], aggregated, node_states)

    @property
    def input_state_dimension(self) -> int:
        return self.state_dimension

    @property
    def output_state_dimension(self) -> int:
        return self.state_dimension
