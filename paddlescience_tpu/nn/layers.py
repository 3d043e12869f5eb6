"""Core layers on the pure-pytree module system (``nn/core.py``).

These replace flax linen/NNX layers in the compute path; all are thin
wrappers over jnp/lax ops so XLA sees exactly the math — matmuls land on the
MXU, elementwise fuses into them.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.nn.core import Buffer, Module, Param, Rngs
from paddlescience_tpu.utils import initializer

__all__ = ["Linear", "Conv", "LayerNorm", "GroupNorm", "InstanceNorm", "Embedding", "Dropout", "identity"]


def identity(x):
    return x


class Linear(Module):
    """y = x @ W + b with configurable init (paddle-style xavier-uniform
    default so reference convergence recipes transfer)."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        kernel_init=None,
        bias_init=None,
        *,
        rngs: Rngs,
    ):
        self.in_features = in_features
        self.out_features = out_features
        if kernel_init is None:
            kernel_init = initializer.xavier_uniform_()
        self.weight = Param(kernel_init(rngs.params(), (in_features, out_features)))
        if bias:
            b = bias_init(rngs.params(), (out_features,)) if bias_init else jnp.zeros((out_features,))
            self.bias = Param(b)
        else:
            self.has_bias = False
        self._use_bias = bias

    def _kernel(self):
        """Effective weight — override point for reparameterizations."""
        return self.weight

    def __call__(self, x):
        y = x @ self._kernel()
        if self._use_bias:
            y = y + self.bias
        return y


class Conv(Module):
    """N-D convolution over channel-last inputs (..., *spatial, C_in).

    kernel layout (*window, C_in, C_out) — maps straight to
    lax.conv_general_dilated with NHWC/HWIO-style dimension numbers (the
    TPU-preferred layout)."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        kernel_size: Union[int, Sequence[int]],
        strides: Union[int, Sequence[int]] = 1,
        padding: Union[str, int, Sequence] = "SAME",
        dilation: Union[int, Sequence[int]] = 1,
        groups: int = 1,
        bias: bool = True,
        kernel_init=None,
        padding_mode: str = "zeros",
        *,
        rngs: Rngs,
    ):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,)
        self.ndim = len(kernel_size)
        self.strides = (strides,) * self.ndim if isinstance(strides, int) else tuple(strides)
        self.dilation = (dilation,) * self.ndim if isinstance(dilation, int) else tuple(dilation)
        if isinstance(padding, int):
            padding = [(padding, padding)] * self.ndim
        self.padding = padding
        # "circular"/"replicate": periodic-wrap / edge padding (paddle
        # padding_mode); applied with jnp.pad before a VALID conv
        self.padding_mode = padding_mode
        if padding_mode in ("circular", "replicate"):
            if padding == "SAME":
                self.padding = [((k - 1) // 2, k // 2) for k in kernel_size]
            elif not isinstance(self.padding, (list, tuple)):
                raise ValueError(f"{padding_mode} padding needs an explicit padding amount")
        self.groups = groups
        if kernel_init is None:
            kernel_init = initializer.conv_init_
        self.weight = Param(
            kernel_init(rngs.params(), (*kernel_size, in_features // groups, out_features))
        )
        self._use_bias = bias
        if bias:
            self.bias = Param(jnp.zeros((out_features,)))
        spatial = "DHW"[3 - self.ndim :]
        self._dn = jax.lax.conv_dimension_numbers(
            (1, *([1] * self.ndim), in_features),
            (*kernel_size, in_features // groups, out_features),
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
        )

    def _kernel(self):
        """Effective conv kernel — override point for weight reparameterizations
        (e.g. spectral normalization, ``arch/dgmr.py``)."""
        return self.weight

    def __call__(self, x):
        # accept (*spatial, C) or (N, *spatial, C)
        squeeze = x.ndim == self.ndim + 1
        if squeeze:
            x = x[None]
        padding = self.padding
        if self.padding_mode in ("circular", "replicate"):
            pads = [(0, 0)] + [tuple(p) for p in self.padding] + [(0, 0)]
            x = jnp.pad(x, pads, mode="wrap" if self.padding_mode == "circular" else "edge")
            padding = "VALID"
        y = jax.lax.conv_general_dilated(
            x,
            self._kernel(),
            window_strides=self.strides,
            padding=padding,
            rhs_dilation=self.dilation,
            dimension_numbers=self._dn,
            feature_group_count=self.groups,
        )
        if self._use_bias:
            y = y + self.bias
        return y[0] if squeeze else y


class LayerNorm(Module):
    def __init__(self, num_features: int, epsilon: float = 1e-5, elementwise_affine: bool = True, *, rngs: Rngs = None):
        self.epsilon = epsilon
        self.affine = elementwise_affine
        if elementwise_affine:
            self.scale = Param(jnp.ones((num_features,)))
            self.shift = Param(jnp.zeros((num_features,)))

    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            y = y * self.scale + self.shift
        return y


class GroupNorm(Module):
    def __init__(self, num_groups: int, num_features: int, epsilon: float = 1e-5, *, rngs: Rngs = None):
        self.num_groups = num_groups
        self.epsilon = epsilon
        self.scale = Param(jnp.ones((num_features,)))
        self.shift = Param(jnp.zeros((num_features,)))

    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        shape = x.shape[:-1] + (g, c // g)
        xg = x.reshape(shape)
        mean = jnp.mean(xg, axis=-1, keepdims=True)
        var = jnp.var(xg, axis=-1, keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        return y * self.scale + self.shift


class InstanceNorm(Module):
    """Normalize each channel over spatial dims (channel-last)."""

    def __init__(self, num_features: int, epsilon: float = 1e-5, *, rngs: Rngs = None):
        self.epsilon = epsilon
        self.scale = Param(jnp.ones((num_features,)))
        self.shift = Param(jnp.zeros((num_features,)))

    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1)) if x.ndim > 2 else (0,)
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * self.scale + self.shift


class Embedding(Module):
    def __init__(self, num_embeddings: int, features: int, embedding_init=None, *, rngs: Rngs):
        init = embedding_init or initializer.normal_(0.0, 1.0)
        self.weight = Param(init(rngs.params(), (num_embeddings, features)))

    def __call__(self, idx):
        return jnp.take(self.weight, idx, axis=0)


class Dropout(Module):
    """Stateless dropout: pass `key` (and deterministic=False) to enable."""

    def __init__(self, rate: float, *, rngs: Rngs = None):
        self.rate = rate

    def __call__(self, x, key: Optional[jax.Array] = None, deterministic: bool = True):
        if deterministic or self.rate == 0.0 or key is None:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
