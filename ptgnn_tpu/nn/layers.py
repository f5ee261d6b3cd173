"""Core neural primitives as functional modules.

Weights use *torch layouts* (Linear weight [out, in], GRUCell weight_ih
[3H, in], Conv1d weight [out, in, k]) so golden weights exported from the
PyTorch reference can be loaded verbatim for activation-parity tests
(SURVEY.md section 6). XLA's dot_general contracts arbitrary dims, so the
layout has no runtime cost on the MXU.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ptgnn_tpu.nn import initializers as init
from ptgnn_tpu.nn.module import Module, Params, fold

# ---------------------------------------------------------------------------
# Activations (plain functions; referenced by name in configs)
# ---------------------------------------------------------------------------

def gelu_exact(x):
    """Exact (erf) GELU: torch.nn.GELU's default, used by the reference's
    MLP message passing (mlpmessagepassing.py:20)."""
    return jax.nn.gelu(x, approximate=False)


def identity(x):
    return x


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "identity": identity,
    None: identity,
}


class Activation:
    """A by-name activation that pickles cleanly.

    Modules are saved with gzip-pickle (core/model.py save/restore) and
    jax.nn functions don't pickle by qualname (custom_jvp wrappers), so
    modules store this resolver instead of the raw function.
    """

    def __init__(self, name):
        assert name in ACTIVATIONS, f"Unknown activation '{name}'"
        self.name = name

    def __call__(self, x):
        return ACTIVATIONS[self.name](x)

    def __repr__(self):
        return f"Activation({self.name!r})"


def get_activation(act):
    """Resolve an activation given as None, a name, or a callable."""
    if isinstance(act, Activation):
        return act
    if callable(act):
        return act
    return Activation(act)


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float, train: bool) -> jax.Array:
    """Inverted dropout; identity when not training or rate==0."""
    if not train or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng key during training")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


# ---------------------------------------------------------------------------
# Linear / Embedding / LayerNorm
# ---------------------------------------------------------------------------


class Linear(Module):
    """y = x @ W.T + b with torch-layout W [out, in].

    Default init mirrors torch.nn.Linear.reset_parameters; call sites that
    re-init in the reference pass explicit ``weight_init`` (e.g.
    xavier_uniform as in reference ptgnn/neuralmodels/mlp.py:61).
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        weight_init=None,
        bias_init=None,
    ):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = use_bias
        self._weight_init = weight_init or init.kaiming_uniform()
        self._bias_init = bias_init or init.torch_linear_bias(in_features)

    def init(self, key: jax.Array) -> Params:
        wkey, bkey = jax.random.split(key)
        params = {"weight": self._weight_init(wkey, (self.out_features, self.in_features))}
        if self.use_bias:
            params["bias"] = self._bias_init(bkey, (self.out_features,))
        return params

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        w = params["weight"]
        y = jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        ).astype(x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)
        return y


class Embedding(Module):
    """Token embedding table [V, D]; torch default init N(0,1)."""

    def __init__(self, num_embeddings: int, embedding_dim: int, weight_init=None):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self._weight_init = weight_init or init.normal()

    def init(self, key: jax.Array) -> Params:
        return {"weight": self._weight_init(key, (self.num_embeddings, self.embedding_dim))}

    def apply(self, params: Params, ids: jax.Array) -> jax.Array:
        return jnp.take(params["weight"], ids, axis=0)


class LayerNorm(Module):
    """LayerNorm over the last dim (torch defaults: eps=1e-5, affine)."""

    def __init__(self, dim: int, eps: float = 1e-5):
        self.dim = dim
        self.eps = eps

    def init(self, key: jax.Array) -> Params:
        del key
        return {"weight": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        normed = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = normed * params["weight"] + params["bias"]
        return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Recurrent cells
# ---------------------------------------------------------------------------


class GRUCell(Module):
    """torch.nn.GRUCell-compatible cell (gate order r, z, n).

    The reference's GGNN state update (reference:
    ptgnn/neuralmodels/gnn/messagepassing/gatedmessagepassing.py:28-32)
    re-initializes weight_hh orthogonal and weight_ih xavier-uniform; pass
    those as overrides there. Defaults are torch's U(-1/sqrt(H), 1/sqrt(H)).
    """

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        weight_ih_init=None,
        weight_hh_init=None,
        bias_ih_init=None,
        bias_hh_init=None,
    ):
        self.input_size = input_size
        self.hidden_size = hidden_size
        k = 1.0 / math.sqrt(hidden_size)
        default = init.uniform(-k, k)
        self._w_ih = weight_ih_init or default
        self._w_hh = weight_hh_init or default
        self._b_ih = bias_ih_init or default
        self._b_hh = bias_hh_init or default

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        h, i = self.hidden_size, self.input_size
        return {
            "weight_ih": self._w_ih(k1, (3 * h, i)),
            "weight_hh": self._w_hh(k2, (3 * h, h)),
            "bias_ih": self._b_ih(k3, (3 * h,)),
            "bias_hh": self._b_hh(k4, (3 * h,)),
        }

    def apply(self, params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
        gi = (
            jax.lax.dot_general(
                x, params["weight_ih"], (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
            ).astype(x.dtype)
            + params["bias_ih"]
        )
        gh = (
            jax.lax.dot_general(
                h, params["weight_hh"], (((h.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.promote_types(h.dtype, jnp.float32),
            ).astype(h.dtype)
            + params["bias_hh"]
        )
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class GRU(Module):
    """Single-layer batch-first GRU (torch.nn.GRU(num_layers=1)).

    Unrolled with lax.scan over time; used by the copy decoder
    (reference: ptgnn/neuralmodels/sequence/grucopydecoder.py:43-45).
    """

    def __init__(self, input_size: int, hidden_size: int):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.cell = GRUCell(input_size, hidden_size)

    def init(self, key: jax.Array) -> Params:
        return self.cell.init(key)

    def apply(self, params: Params, x: jax.Array, h0: jax.Array):
        """x: [B, T, I]; h0: [B, H] -> (outputs [B, T, H], h_final [B, H])."""

        def step(h, xt):
            h_new = self.cell.apply(params, xt, h)
            return h_new, h_new

        xs = jnp.swapaxes(x, 0, 1)  # [T, B, I]
        h_final, ys = jax.lax.scan(step, h0, xs)
        return jnp.swapaxes(ys, 0, 1), h_final


# ---------------------------------------------------------------------------
# Conv1d
# ---------------------------------------------------------------------------


class Conv1d(Module):
    """torch.nn.Conv1d (stride 1, no padding): [B, C_in, L] -> [B, C_out, L-k+1]."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int, use_bias: bool = True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.use_bias = use_bias
        fan_in = in_channels * kernel_size
        self._weight_init = init.kaiming_uniform()
        bound = 1.0 / math.sqrt(fan_in)
        self._bias_init = init.uniform(-bound, bound)

    def init(self, key: jax.Array) -> Params:
        wkey, bkey = jax.random.split(key)
        params = {
            "weight": self._weight_init(
                wkey, (self.out_channels, self.in_channels, self.kernel_size)
            )
        }
        if self.use_bias:
            params["bias"] = self._bias_init(bkey, (self.out_channels,))
        return params

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            params["weight"].astype(jnp.float32),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        ).astype(x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)[None, :, None]
        return y


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


class MLP(Module):
    """Configurable MLP mirroring the reference (ptgnn/neuralmodels/mlp.py:9-80).

    hidden_layers is an int (that many hidden layers of output_dimension
    units; degenerate size-1 widened to 32 with a warning) or an explicit
    size list. Bias-free xavier-uniform Linears, dropout before every layer,
    activation between hidden layers, no final activation.
    """

    def __init__(
        self,
        input_dimension: int,
        output_dimension: int,
        hidden_layers: Union[int, Sequence[int]] = 1,
        use_biases: bool = False,
        activation="relu",
        dropout_rate: float = 0.0,
    ):
        if isinstance(hidden_layers, int):
            if output_dimension == 1:
                import logging

                logging.getLogger(__name__).warning(
                    "MLP was created with %d layers of size 1, which is most "
                    "likely wrong. Switching to %d layers of size 32; to get "
                    "hidden layers of size 1, use hidden_layers=[1,...,1] "
                    "explicitly.", hidden_layers, hidden_layers,
                )
                hidden_sizes = [32] * hidden_layers
            else:
                hidden_sizes = [output_dimension] * hidden_layers
        else:
            hidden_sizes = list(hidden_layers)
        # `> 1` mirrors the reference exactly (mlp.py:47-48): a SINGLE hidden
        # layer without activation is allowed there too.
        if len(hidden_sizes) > 1:
            assert activation is not None, "Multiple linear layers without an activation"

        self.dropout_rate = dropout_rate
        self.activation = get_activation(activation)
        self._has_activation = activation is not None
        self.layers: List[Linear] = []
        cur = input_dimension
        for h in hidden_sizes:
            self.layers.append(
                Linear(cur, h, use_bias=use_biases, weight_init=init.xavier_uniform())
            )
            cur = h
        self.layers.append(
            Linear(cur, output_dimension, use_bias=use_biases, weight_init=init.xavier_uniform())
        )
        self.input_dimension = input_dimension
        self.output_dimension = output_dimension

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.layers))
        return {f"layer_{i}": l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def apply(self, params: Params, x: jax.Array, *, train: bool = False, rng=None) -> jax.Array:
        n = len(self.layers)
        for i, layer in enumerate(self.layers):
            x = dropout(fold(rng, i), x, self.dropout_rate, train)
            x = layer.apply(params[f"layer_{i}"], x)
            if self._has_activation and i < n - 1:
                x = self.activation(x)
        return x
