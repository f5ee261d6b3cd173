"""Residual connections expressed as message-passing layer pairs.

The reference implements these with a mutable side channel: a pass-through
layer stashes node states onto the downstream layer object
(residuallayers.py:8-32). That is incompatible with pure function tracing, so
here the *engine* threads a stash dict: an origin layer returns its input and
a (key -> states) entry; the paired residual layer consumes the entry. The
pairing key is the residual layer object itself, created via the same
``pass_through_dummy_layer()`` API as the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ptgnn_tpu.graph.messagepassing.base import AbstractMessagePassingLayer
from ptgnn_tpu.nn.layers import Linear, dropout
from ptgnn_tpu.nn.module import Params


class _ResidualOriginLayer(AbstractMessagePassingLayer):
    """Pass-through that records node states for its paired target layer."""

    def __init__(self, input_dim: int, target_layer: "AbstractResidualLayer"):
        self.__input_dim = input_dim
        self.target_layer = target_layer

    def init(self, key) -> Params:
        return {}

    def apply(self, params, node_states, ctx, *, train=False, rng=None):
        return node_states

    @property
    def input_state_dimension(self) -> int:
        return self.__input_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__input_dim


class AbstractResidualLayer(AbstractMessagePassingLayer):
    """Base for layers combining current states with a stashed origin."""

    def pass_through_dummy_layer(self) -> _ResidualOriginLayer:
        return _ResidualOriginLayer(self.input_state_dimension, target_layer=self)

    def combine(self, params: Params, original: jax.Array, node_states: jax.Array, *, train, rng):
        raise NotImplementedError


class MeanResidualLayer(AbstractResidualLayer):
    def __init__(self, input_dim: int):
        self.__input_dim = input_dim

    def init(self, key) -> Params:
        return {}

    def combine(self, params, original, node_states, *, train=False, rng=None):
        return (original + node_states) * 0.5

    @property
    def input_state_dimension(self) -> int:
        return self.__input_dim

    @property
    def output_state_dimension(self) -> int:
        return self.__input_dim


class ConcatResidualLayer(AbstractResidualLayer):
    def __init__(self, input_dim: int):
        self.__input_dim = input_dim

    def init(self, key) -> Params:
        return {}

    def combine(self, params, original, node_states, *, train=False, rng=None):
        return jnp.concatenate([original, node_states], axis=-1)

    @property
    def input_state_dimension(self) -> int:
        return self.__input_dim

    @property
    def output_state_dimension(self) -> int:
        return 2 * self.__input_dim


class LinearResidualLayer(AbstractResidualLayer):
    def __init__(
        self,
        state_dimension1: int,
        state_dimension2: int,
        target_state_size: int,
        dropout_rate: float = 0.0,
    ):
        self.__input_dim1 = state_dimension1
        self.__input_dim2 = state_dimension2
        self.dropout_rate = dropout_rate
        self.linear = Linear(
            state_dimension1 + state_dimension2, target_state_size, use_bias=False
        )

    def pass_through_dummy_layer(self) -> _ResidualOriginLayer:
        return _ResidualOriginLayer(self.__input_dim1, target_layer=self)

    def init(self, key) -> Params:
        return {"linear": self.linear.init(key)}

    def combine(self, params, original, node_states, *, train=False, rng=None):
        out = self.linear.apply(
            params["linear"], jnp.concatenate([original, node_states], axis=-1)
        )
        return dropout(rng, out, self.dropout_rate, train)

    @property
    def input_state_dimension(self) -> int:
        return self.__input_dim2

    @property
    def output_state_dimension(self) -> int:
        return self.linear.out_features
