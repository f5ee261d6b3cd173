"""Principal Neighbourhood Aggregation (Corso et al. 2020).

Mirrors the reference's pluggable PNA aggregator
(ptgnn/neuralmodels/gnn/messagepassing/pna_aggregation.py:13-59):
sum/mean/max/min/std aggregations x {1, log-degree, 1/log-degree} scalers
-> 15x message-dim output. Every reduction goes through the shared
aggregation dispatch (base.masked_segment_aggregate): the Pallas
sorted-segment kernels on TPU batches in the unified layout, and one
collective per reduction when the edge array is partitioned across devices
(parallel/edge_sharding.py) — a direct segment op would return per-shard
PARTIAL aggregates there. All accumulation in fp32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import (
    AbstractMessageAggregation,
    GraphContext,
    masked_segment_aggregate,
    masked_segment_degree,
)
from ptgnn_tpu.nn.module import Params


class PnaMessageAggregation(AbstractMessageAggregation):
    def __init__(self, delta: float = 1.0):
        self._delta = delta  # Eq 5 of the paper

    def init(self, key: jax.Array) -> Params:
        del key
        return {}

    def apply(
        self, params: Params, messages: jax.Array, ctx: GraphContext, num_nodes: int
    ) -> jax.Array:
        del params
        targets = ctx.adjacency.receivers
        degree = masked_segment_degree(ctx, num_nodes)  # [N] int32, global

        msg_dtype = messages.dtype
        messages = messages.astype(jnp.float32)
        sum_agg = masked_segment_aggregate(messages, ctx, num_nodes, "sum")
        mean_agg = sum_agg / (degree[:, None].astype(jnp.float32) + 1e-5)
        max_agg = masked_segment_aggregate(messages, ctx, num_nodes, "max")
        min_agg = masked_segment_aggregate(messages, ctx, num_nodes, "min")

        # std via E[m^2] - mean^2, relu-clamped per element as in the reference
        mean_sq_per_edge = jnp.take(mean_agg, targets, axis=0, mode="fill", fill_value=0.0)
        std_components = jax.nn.relu(jnp.square(messages) - jnp.square(mean_sq_per_edge)) + 1e-10
        std = jnp.sqrt(masked_segment_aggregate(std_components, ctx, num_nodes, "sum"))

        all_aggregations = jnp.concatenate(
            [sum_agg, mean_agg, max_agg, min_agg, std], axis=-1
        ).astype(msg_dtype)

        scaler_p1 = jnp.log(degree.astype(jnp.float32) + 1.0)[:, None] / self._delta
        scaler_m1 = 1.0 / (scaler_p1 + 1e-3)
        return jnp.concatenate(
            [
                all_aggregations,
                all_aggregations * scaler_p1.astype(msg_dtype),
                all_aggregations * scaler_m1.astype(msg_dtype),
            ],
            axis=-1,
        )

    def output_state_size(self, message_input_size: int) -> int:
        return message_input_size * 5 * 3
