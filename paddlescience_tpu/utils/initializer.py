"""Named weight initializers.

TPU-native counterpart of reference ``ppsci/utils/initializer.py:112+`` —
instead of in-place tensor mutation (paddle style), these are functional
``jax.nn.initializers``-compatible callables ``init(key, shape, dtype)``,
the idiomatic JAX form. Names match the reference so configs port 1:1.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

Initializer = Callable[..., jnp.ndarray]

__all__ = [
    "get_initializer",
    "uniform_",
    "normal_",
    "trunc_normal_",
    "constant_",
    "ones_",
    "zeros_",
    "xavier_uniform_",
    "xavier_normal_",
    "glorot_normal_",
    "glorot_uniform_",
    "kaiming_uniform_",
    "kaiming_normal_",
    "linear_init_",
    "conv_init_",
    "orthogonal_",
]


def _fans(shape: Sequence[int]) -> tuple:
    """fan_in/fan_out for a (in, out) kernel or convolutional kernel
    (*window, in, out) — matches flax convention (last axis = out)."""
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def uniform_(a: float = 0.0, b: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=a, maxval=b)

    return init


def normal_(mean: float = 0.0, std: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return mean + std * random.normal(key, shape, dtype)

    return init


def trunc_normal_(mean: float = 0.0, std: float = 1.0, a: float = -2.0, b: float = 2.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        return mean + std * random.truncated_normal(key, lo, hi, shape, dtype)

    return init


def constant_(value: float = 0.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def ones_(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def zeros_(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def xavier_uniform_(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_normal_(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * random.normal(key, shape, dtype)

    return init


# glorot_* are truncated-normal variants (reference `glorot_normal_` uses
# a truncated normal scaled by 1/(.87962566103423978) like jax's variance
# scaling "truncated_normal").
def glorot_normal_(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.glorot_normal(in_axis=-2, out_axis=-1)(key, shape, dtype)


def glorot_uniform_(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.glorot_uniform(in_axis=-2, out_axis=-1)(key, shape, dtype)


def kaiming_uniform_(nonlinearity: str = "leaky_relu", negative_slope: float = math.sqrt(5.0)) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        gain = math.sqrt(2.0 / (1 + negative_slope**2)) if nonlinearity == "leaky_relu" else math.sqrt(2.0)
        bound = gain * math.sqrt(3.0 / fan_in)
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal_(nonlinearity: str = "relu") -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        gain = math.sqrt(2.0)
        std = gain / math.sqrt(fan_in)
        return std * random.normal(key, shape, dtype)

    return init


def linear_init_(key, shape, dtype=jnp.float32):
    """Paddle-style default linear init: U(-sqrt(1/fan_in), sqrt(1/fan_in))."""
    fan_in, _ = _fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_init_(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def orthogonal_(gain: float = 1.0) -> Initializer:
    return jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)


_NAMED = {
    "uniform": uniform_(-1.0, 1.0),
    "normal": normal_(),
    "truncated_normal": trunc_normal_(),
    "constant": constant_(),
    "ones": ones_,
    "zeros": zeros_,
    "xavier_uniform": xavier_uniform_(),
    "xavier_normal": xavier_normal_(),
    "glorot_normal": glorot_normal_,
    "glorot_uniform": glorot_uniform_,
    "kaiming_uniform": kaiming_uniform_(),
    "kaiming_normal": kaiming_normal_(),
    "linear": linear_init_,
    "orthogonal": orthogonal_(),
}


def get_initializer(name: str) -> Initializer:
    if name not in _NAMED:
        raise ValueError(f"initializer '{name}' not registered, available: {sorted(_NAMED)}")
    return _NAMED[name]
