"""MLP message passing (reference: mlpmessagepassing.py:12-125).

Per-edge-type MLP message functions run as stacked tile-batched matmuls; the
LayerNorm -> Dense(+Tanh) -> Dropout state update and optional pluggable
aggregation (PNA) follow the reference.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import (
    AbstractMessageAggregation,
    AbstractMessagePassingLayer,
    GraphContext,
)
from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.layers import LayerNorm, Linear, dropout, get_activation
from ptgnn_tpu.nn.module import Module, Params, fold
from ptgnn_tpu.ops.typed_linear import typed_tile_matmul


class TypedMLP(Module):
    """Per-edge-type MLPs evaluated as stacked tile matmuls.

    Semantics mirror ptgnn/neuralmodels/mlp.py applied per edge type
    (mlpmessagepassing.py:38-47): bias-free xavier-uniform linears, dropout
    before every layer, activation between hidden layers, none at the end.
    """

    def __init__(
        self,
        num_types: int,
        input_dimension: int,
        output_dimension: int,
        hidden_layers: Union[int, Sequence[int]] = 0,
        activation="relu",
        dropout_rate: float = 0.0,
    ):
        if isinstance(hidden_layers, int):
            hidden_sizes = [output_dimension if output_dimension != 1 else 32] * hidden_layers
        else:
            hidden_sizes = list(hidden_layers)
        self.num_types = num_types
        self.dims: List[int] = [input_dimension] + hidden_sizes + [output_dimension]
        self.activation = get_activation(activation)
        self.dropout_rate = dropout_rate

    def init(self, key: jax.Array) -> Params:
        params = {}
        w_init = init.xavier_uniform()
        for layer in range(len(self.dims) - 1):
            d_in, d_out = self.dims[layer], self.dims[layer + 1]
            keys = jax.random.split(jax.random.fold_in(key, layer), self.num_types)
            params[f"weights_{layer}"] = jnp.stack(
                [w_init(k, (d_out, d_in)).T for k in keys]
            )  # [T, d_in, d_out]
        return params

    def apply(self, params, x, tile_types, edge_tile, *, train=False, rng=None):
        n_layers = len(self.dims) - 1
        for layer in range(n_layers):
            x = dropout(fold(rng, layer), x, self.dropout_rate, train)
            x = typed_tile_matmul(x, params[f"weights_{layer}"], tile_types, edge_tile)
            if layer < n_layers - 1:
                x = self.activation(x)
        return x


class MlpMessagePassingLayer(AbstractMessagePassingLayer):
    def __init__(
        self,
        input_state_dimension: int,
        output_state_dimension: int,
        message_dimension: int,
        num_edge_types: int,
        message_aggregation_function: Union[str, AbstractMessageAggregation],
        message_activation="gelu",
        use_target_state_as_message_input: bool = True,
        mlp_hidden_layers: Union[int, Sequence[int]] = 0,
        use_layer_norm: bool = True,
        use_dense_layer: bool = True,
        dropout_rate: float = 0.0,
        dense_activation="tanh",
        features_dimension: int = 0,
    ):
        self.__input_state_dim = input_state_dimension
        self.__output_state_dim = output_state_dimension
        self.use_target_state_as_message_input = use_target_state_as_message_input
        self.num_edge_types = num_edge_types
        self.aggregation_fn = message_aggregation_function
        self.dropout_rate = dropout_rate

        message_input_size = (
            2 * input_state_dimension if use_target_state_as_message_input else input_state_dimension
        )
        self.message_mlp = TypedMLP(
            num_types=num_edge_types,
            input_dimension=message_input_size + features_dimension,
            output_dimension=message_dimension,
            hidden_layers=mlp_hidden_layers,
        )
        if isinstance(message_aggregation_function, str):
            aggregated_size = message_dimension
        else:
            aggregated_size = message_aggregation_function.output_state_size(message_dimension)

        self.message_activation = (
            get_activation(message_activation) if message_activation is not None else None
        )
        self.layer_norm = LayerNorm(aggregated_size) if use_layer_norm else None
        self.dense = (
            Linear(
                aggregated_size,
                output_state_dimension,
                use_bias=True,
                weight_init=init.xavier_uniform(),
            )
            if use_dense_layer
            else None
        )
        self.dense_activation = (
            get_activation(dense_activation) if dense_activation is not None else None
        )

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params: Params = {"message_mlp": self.message_mlp.init(k1)}
        if self.layer_norm is not None:
            params["layer_norm"] = self.layer_norm.init(k2)
        if self.dense is not None:
            params["dense"] = self.dense.init(k3)
        if isinstance(self.aggregation_fn, AbstractMessageAggregation):
            params["aggregation"] = self.aggregation_fn.init(k4)
        return params

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
        if len(self.message_mlp.dims) == 2 and ctx.edge_features is None:
            # Single-linear message fn: the scatter-free fused path applies.
            from ptgnn_tpu.graph.messagepassing.base import (
                fused_linear_message_aggregation_or_none,
            )

            aggregated = fused_linear_message_aggregation_or_none(
                params["message_mlp"]["weights_0"], node_states, ctx,
                reduction=self.aggregation_fn,
                use_target_state=self.use_target_state_as_message_input,
                dropout_rate=self.message_mlp.dropout_rate, train=train,
                rng=fold(rng, 0),
            )
        if aggregated is not None:
            return self._finish(params, aggregated, train=train, rng=rng)
        msg_input = jnp.take(node_states, adj.senders, axis=0)
        if self.use_target_state_as_message_input:
            # Padding receivers point out of range; clip for the gather (the
            # resulting garbage rows are masked out of the aggregation).
            safe_recv = jnp.minimum(adj.receivers, node_states.shape[0] - 1)
            tgt = jnp.take(node_states, safe_recv, axis=0)
            msg_input = jnp.concatenate([msg_input, tgt], axis=-1)
        if ctx.edge_features is not None:
            msg_input = jnp.concatenate([msg_input, ctx.edge_features], axis=-1)

        messages = self.message_mlp.apply(
            params["message_mlp"],
            msg_input,
            adj.tile_types,
            adj.edge_tile,
            train=train,
            rng=fold(rng, 0),
        )

        if isinstance(self.aggregation_fn, AbstractMessageAggregation):
            aggregated = self.aggregation_fn.apply(
                params["aggregation"], messages, ctx, node_states.shape[0]
            )
        else:
            aggregated = self._aggregate_messages(
                messages, ctx, node_states.shape[0], self.aggregation_fn
            )
        return self._finish(params, aggregated, train=train, rng=rng)

    def _finish(self, params, aggregated, *, train, rng):
        """Post-aggregation update (activation -> LN -> dense -> dropout)."""
        if self.message_activation is not None:
            aggregated = self.message_activation(aggregated)
        out = aggregated
        if self.layer_norm is not None:
            out = self.layer_norm.apply(params["layer_norm"], out)
        if self.dense is not None:
            out = self.dense.apply(params["dense"], out)
            if self.dense_activation is not None:
                out = self.dense_activation(out)
        return dropout(fold(rng, 1), out, self.dropout_rate, train)

    @property
    def input_state_dimension(self) -> int:
        return self.__input_state_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__output_state_dim
