"""GraphNorm: per-graph feature normalization (Cai et al. 2020).

Mirrors the reference (ptgnn/neuralmodels/gnn/messagepassing/graphnorm.py:9-54)
with masked per-graph moments: padding nodes are excluded from the mean and
variance via the node mask, and statistics are computed in fp32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer, GraphContext
from ptgnn_tpu.nn.module import Params
from ptgnn_tpu.ops.segment import segment_count, segment_sum


class GraphNorm(AbstractMessagePassingLayer):
    # per-graph moments psum over the node axis; no sender features read
    needs_boundary_exchange = False

    def __init__(self, input_state_dimension: int, eps: float = 1e-10):
        self.__input_state_dim = input_state_dimension
        self.__eps = eps

    @staticmethod
    def _masked_mean(x, ctx: GraphContext, num_graphs: int):
        """Per-graph masked mean; under node sharding each shard holds only
        its rows, so partial sums and counts psum over the node axis."""
        total = segment_sum(x, ctx.node_graph, num_graphs, ctx.node_mask)
        cnt = segment_count(ctx.node_graph, num_graphs, ctx.node_mask).astype(
            x.dtype
        )
        if ctx.node_sharding is not None:
            axis = ctx.node_sharding.axis
            total = jax.lax.psum(total, axis)
            cnt = jax.lax.psum(cnt, axis)
        return total / jnp.maximum(cnt, 1.0)[:, None]

    def init(self, key: jax.Array) -> Params:
        del key
        d = self.__input_state_dim
        return {
            "gamma": jnp.ones((1, d)),
            "alpha": jnp.ones((1, d)),
            "bias": jnp.zeros((1, d)),
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
        del train, rng
        num_graphs = ctx.max_graphs
        x = node_states.astype(jnp.float32)
        per_graph_mean = self._masked_mean(x, ctx, num_graphs)
        mean_per_node = jnp.take(
            per_graph_mean, ctx.node_graph, axis=0, mode="fill", fill_value=0.0
        )
        shifted = x - params["alpha"].astype(jnp.float32) * mean_per_node
        sigma_2 = (
            self._masked_mean(jnp.square(shifted), ctx, num_graphs) + self.__eps
        )
        sigma_per_node = jnp.take(sigma_2, ctx.node_graph, axis=0, mode="fill", fill_value=1.0)
        out = (
            params["gamma"].astype(jnp.float32) * shifted * jax.lax.rsqrt(sigma_per_node)
            + params["bias"].astype(jnp.float32)
        )
        return out.astype(node_states.dtype)

    @property
    def input_state_dimension(self) -> int:
        return self.__input_state_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__input_state_dim
