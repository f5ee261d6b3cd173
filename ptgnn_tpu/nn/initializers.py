"""Weight initializers with PyTorch-compatible semantics.

The reference relies on torch.nn.init (xavier_uniform_/xavier_normal_/
orthogonal_/uniform_/normal_, plus the torch.nn.Linear/GRUCell default
resets); we reproduce those exactly so per-layer activation parity on fixed
imported weights holds (SURVEY.md section 6 target). All initializers take a
PRNG key and the *torch-layout* shape (e.g. Linear weight is [out, in]).

Initializers are small picklable callable objects (not closures): neural
models and their modules are saved with gzip-pickle
(core/model.py save/restore), so everything reachable from a module must
pickle.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _fan_in_out(shape: Sequence[int]) -> Tuple[int, int]:
    """Fan-in/out following torch.nn.init._calculate_fan_in_and_fan_out.

    For a 2D weight [out, in]: fan_in=in, fan_out=out. For conv weights
    [out, in, *kernel]: receptive field multiplies both.
    """
    if len(shape) < 2:
        raise ValueError("fan in/out undefined for <2D shapes")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


class Initializer:
    """Base: a picklable (key, shape, dtype) -> array callable."""

    def __call__(self, key, shape, dtype=jnp.float32):
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}({vars(self)})"


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


class constant(Initializer):
    def __init__(self, value: float):
        self.value = value

    def __call__(self, key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, self.value, dtype)


class uniform(Initializer):
    """torch.nn.init.uniform_(a=low, b=high)."""

    def __init__(self, low: float = 0.0, high: float = 1.0):
        self.low = low
        self.high = high

    def __call__(self, key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=self.low, maxval=self.high)


class normal(Initializer):
    """torch.nn.init.normal_."""

    def __init__(self, mean: float = 0.0, std: float = 1.0):
        self.mean = mean
        self.std = std

    def __call__(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * self.std + self.mean


class xavier_uniform(Initializer):
    """torch.nn.init.xavier_uniform_: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out))."""

    def __init__(self, gain: float = 1.0):
        self.gain = gain

    def __call__(self, key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_out(shape)
        a = self.gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


class xavier_normal(Initializer):
    """torch.nn.init.xavier_normal_: N(0, std), std = gain*sqrt(2/(fan_in+fan_out))."""

    def __init__(self, gain: float = 1.0):
        self.gain = gain

    def __call__(self, key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_out(shape)
        std = self.gain * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std


class kaiming_uniform(Initializer):
    """torch.nn.init.kaiming_uniform_ with leaky_relu nonlinearity.

    This is torch.nn.Linear's default weight reset (reset_parameters).
    """

    def __init__(self, a: float = math.sqrt(5.0)):
        self.a = a

    def __call__(self, key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape)
        gain = math.sqrt(2.0 / (1.0 + self.a * self.a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in: int) -> uniform:
    """torch.nn.Linear default bias reset: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return uniform(-bound, bound)


class orthogonal(Initializer):
    """torch.nn.init.orthogonal_ (QR of a gaussian, sign-corrected)."""

    def __init__(self, gain: float = 1.0):
        self.gain = gain

    def __call__(self, key, shape, dtype=jnp.float32):
        if len(shape) < 2:
            raise ValueError("orthogonal requires >=2D shape")
        rows = shape[0]
        cols = 1
        for s in shape[1:]:
            cols *= s
        flat = (max(rows, cols), min(rows, cols))
        g = jax.random.normal(key, flat, jnp.float32)
        q, r = jnp.linalg.qr(g)
        # Sign correction so distribution is uniform over orthogonal group.
        d = jnp.diagonal(r)
        q = q * jnp.sign(d)[None, :]
        if rows < cols:
            q = q.T
        return (self.gain * q.reshape(shape)).astype(dtype)
