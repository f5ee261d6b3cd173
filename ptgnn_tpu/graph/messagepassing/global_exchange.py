"""Global graph-state exchange (reference:
ptgnn/neuralmodels/gnn/messagepassing/globalgraphexchange.py:13-72).

Summarizes each graph with a var-sized reduce over its (masked) nodes, then
updates every node with its graph's summary. Per-graph summaries use the
padded graph budget, so shapes stay static.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer, GraphContext
from ptgnn_tpu.nn.layers import GRUCell, dropout
from ptgnn_tpu.nn.module import Params, fold
from ptgnn_tpu.reduceops.varsizedsummary import (
    AbstractVarSizedElementReduce,
    ElementsToSummaryRepresentationInput,
)


class AbstractGlobalGraphExchange(AbstractMessagePassingLayer):
    # all_gathers its own node view for the per-graph summary; never reads
    # the boundary recv buffer or the adjacency
    needs_boundary_exchange = False

    def __init__(
        self,
        global_graph_representation_module: AbstractVarSizedElementReduce,
        dropout_rate: float = 0.0,
    ):
        self.global_graph_representation_module = global_graph_representation_module
        self.dropout_rate = dropout_rate

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "summary": self.global_graph_representation_module.init(k1),
            "update": self._init_update(k2),
        }

    def _init_update(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def _update_node_states(
        self, params: Params, node_states: jax.Array, global_info_per_node: jax.Array
    ) -> jax.Array:
        raise NotImplementedError

    def apply(
        self,
        params: Params,
        node_states: jax.Array,
        ctx: GraphContext,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        if ctx.node_sharding is not None:
            ns = ctx.node_sharding
            rows_per = ns.rows_per
            if getattr(
                self.global_graph_representation_module,
                "supports_sharded_inputs",
                False,
            ):
                # Distributed summary (round 5): every in-repo reduce honors
                # shard_axis — per-graph summaries come out of LOCAL rows
                # plus one [G, D'] collective per reduction (psum /
                # differentiable pmax; softmax via global shift + global
                # denominator). No [N, D] buffer; the result is replicated.
                inputs = ElementsToSummaryRepresentationInput(
                    element_embeddings=ns.h_local,
                    element_to_sample_map=ctx.node_graph[:rows_per],
                    num_samples=ctx.max_graphs,
                    mask=ctx.node_mask[:rows_per],
                    shard_axis=ns.axis,
                )
            else:
                # External reduce that predates shard_axis: one transient
                # [N, D] all_gather buys running it unchanged.
                inputs = ElementsToSummaryRepresentationInput(
                    element_embeddings=jax.lax.all_gather(
                        ns.h_local, ns.axis, tiled=True
                    ),
                    element_to_sample_map=ns.node_graph_global,
                    num_samples=ctx.max_graphs,
                    mask=ns.node_mask_global,
                )
        else:
            inputs = ElementsToSummaryRepresentationInput(
                element_embeddings=node_states,
                element_to_sample_map=ctx.node_graph,
                num_samples=ctx.max_graphs,
                mask=ctx.node_mask,
            )
        graph_representations = self.global_graph_representation_module.apply(
            params["summary"], inputs
        )  # [G_pad, D']
        graph_representations = dropout(
            fold(rng, 0), graph_representations, self.dropout_rate, train
        )
        per_node = jnp.take(
            graph_representations, ctx.node_graph, axis=0, mode="fill", fill_value=0.0
        )
        return self._update_node_states(params["update"], node_states, per_node)


class GruGlobalStateUpdate(AbstractGlobalGraphExchange):
    """GRUCell(node <- global summary) update
    (reference: globalgraphexchange.py:48-72)."""

    def __init__(
        self,
        global_graph_representation_module: AbstractVarSizedElementReduce,
        input_state_size: int,
        summarized_state_size: int,
        dropout_rate: float = 0.0,
    ):
        super().__init__(global_graph_representation_module, dropout_rate)
        self.__input_dim = input_state_size
        self.gru_cell = GRUCell(input_size=summarized_state_size, hidden_size=input_state_size)

    def _init_update(self, key: jax.Array) -> Params:
        return self.gru_cell.init(key)

    def _update_node_states(self, params, node_states, global_info_per_node):
        return self.gru_cell.apply(params, global_info_per_node, node_states)

    @property
    def input_state_dimension(self) -> int:
        return self.__input_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__input_dim
