"""Activation zoo.

TPU-native counterpart of reference ``ppsci/arch/activation.py:28-146``.
Stateless activations are plain jnp functions (fully fusable by XLA);
parametric ones (Stan, Swish) are ``psci.nn`` modules with Param leaves.
"""

from __future__ import annotations

import math
from typing import Callable, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.nn.core import Module, Param, Rngs

__all__ = ["Stan", "Swish", "Siren", "get_activation"]


class Stan(Module):
    """Self-scalable Tanh: tanh(x) * (1 + beta * x).
    Reference: ppsci/arch/activation.py:28 (https://arxiv.org/abs/2204.12589v1)."""

    def __init__(self, out_features: int = 1, *, rngs: Rngs = None):
        self.beta = Param(jnp.ones((out_features,)))

    def __call__(self, x):
        return jnp.tanh(x) * (1 + self.beta * x)


class Swish(Module):
    """x * sigmoid(beta * x) with learnable scalar beta.
    Reference: ppsci/arch/activation.py:49."""

    def __init__(self, beta: float = 1.0, *, rngs: Rngs = None):
        self.beta = Param(jnp.asarray(beta, jnp.float32))

    def __call__(self, x):
        return x * jax.nn.sigmoid(self.beta * x)


class Siren:
    """sin(w0 * x) activation with the SIREN init scheme.
    Reference: ppsci/arch/activation.py:91-137."""

    def __init__(self, w0: float = 30.0):
        self.w0 = w0

    def __call__(self, x):
        return jnp.sin(self.w0 * x)

    @staticmethod
    def first_layer_init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2]
        bound = 1.0 / fan_in
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    @staticmethod
    def hidden_layer_init(w0: float = 30.0):
        def init(key, shape, dtype=jnp.float32):
            fan_in = shape[-2]
            bound = math.sqrt(6.0 / fan_in) / w0
            return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

        return init


_FUNCS = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "softplus": jax.nn.softplus,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}

# parametric activation classes — instantiated by the arch (need shape/rngs)
_CLASSES = {"stan": Stan, "swish": Swish, "siren": Siren}


def get_activation(act_name: str) -> Union[Callable, type]:
    """Return a jnp function for stateless activations; the class itself for
    parametric ones ('stan', 'swish', 'siren') which the caller instantiates."""
    name = act_name.lower()
    if name in _FUNCS:
        return _FUNCS[name]
    if name in _CLASSES:
        return _CLASSES[name]
    raise ValueError(f"act_name({act_name}) not found; available: {sorted(_FUNCS) + sorted(_CLASSES)}")
