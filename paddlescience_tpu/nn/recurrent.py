"""Recurrent layers: LSTM / ConvLSTM over lax.scan (whole sequence = one
XLA while loop; gate matmuls hit the MXU)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv
from paddlescience_tpu.utils import initializer

__all__ = ["LSTM", "ConvLSTMCell", "pixel_shuffle"]


class LSTM(Module):
    """Single-layer LSTM over (B, T, F) -> (B, T, H)."""

    def __init__(self, input_size: int, hidden_size: int, *, rngs: Rngs):
        self.hidden_size = hidden_size
        k = 1.0 / math.sqrt(hidden_size)
        init = initializer.uniform_(-k, k)
        self.w = Param(init(rngs.params(), (input_size + hidden_size, 4 * hidden_size)))
        self.b = Param(jnp.zeros((4 * hidden_size,)))

    def __call__(self, x: jnp.ndarray, init_state: Optional[Tuple] = None) -> jnp.ndarray:
        B, T, F = x.shape
        H = self.hidden_size
        h0 = jnp.zeros((B, H)) if init_state is None else init_state[0]
        c0 = jnp.zeros((B, H)) if init_state is None else init_state[1]
        w, b = self.w, self.b

        def step(carry, xt):
            h, c = carry
            z = jnp.concatenate([xt, h], axis=-1) @ w + b
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (_, _), hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(hs, 0, 1)


class ConvLSTMCell(Module):
    """Convolutional LSTM cell over NHWC states (reference phycrnet.py:229)."""

    def __init__(
        self,
        input_channels: int,
        hidden_channels: int,
        input_kernel_size: int,
        input_stride: int = 1,
        input_padding: int = 0,
        *,
        rngs: Rngs,
    ):
        self.hidden_channels = hidden_channels
        self.input_stride = input_stride
        self.conv_x = Conv(
            input_channels, 4 * hidden_channels, (input_kernel_size, input_kernel_size),
            strides=input_stride, padding=input_padding, rngs=rngs,
        )
        self.conv_h = Conv(hidden_channels, 4 * hidden_channels, (3, 3), padding="SAME", bias=False, rngs=rngs)

    def __call__(self, x, state):
        h, c = state
        z = self.conv_x(x) + self.conv_h(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)

    def init_state(self, x_shape):
        B, H, W, _ = x_shape
        s = self.input_stride
        return (
            jnp.zeros((B, H // s, W // s, self.hidden_channels)),
            jnp.zeros((B, H // s, W // s, self.hidden_channels)),
        )


def pixel_shuffle(x: jnp.ndarray, upscale: int) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), channel-last."""
    B, H, W, C = x.shape
    r = upscale
    x = x.reshape(B, H, W, r, r, C // (r * r))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * r, W * r, C // (r * r))
