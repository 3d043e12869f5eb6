"""FNO1d / geoFNO (reference ``ppsci/arch/geofno.py:95``) and VelocityGAN
(reference ``ppsci/arch/velocitygan.py:25,87``).

FNO1d: channel-last 1-D FNO (lift → 4 spectral layers with pointwise skip →
project), used by the shock_wave/geoFNO examples. VelocityGAN: seismic
velocity inversion encoder-decoder generator + conv discriminator.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, Linear

__all__ = ["FNO1d", "VelocityGenerator", "VelocityDiscriminator"]


class _Spectral1d(Module):
    def __init__(self, channels: int, modes: int, *, rngs: Rngs):
        scale = 1.0 / (channels * channels)
        self.w_re = Param(scale * jax.random.normal(rngs.params(), (channels, channels, modes)))
        self.w_im = Param(scale * jax.random.normal(rngs.params(), (channels, channels, modes)))
        self.modes = modes

    def __call__(self, x, out_size=None):
        # x: (B, N, C); out_size resamples the output grid in Fourier space
        # (reference geofno.py SpectralConv1d's output_size argument)
        n_out = out_size or x.shape[1]
        xh = jnp.fft.rfft(x, axis=1)
        w = self.w_re + 1j * self.w_im
        m = min(self.modes, xh.shape[1], n_out // 2 + 1)
        mixed = jnp.einsum("bmi,iom->bmo", xh[:, :m], w[..., :m])
        out = jnp.zeros((xh.shape[0], n_out // 2 + 1, mixed.shape[-1]), xh.dtype)
        out = out.at[:, :m].set(mixed)
        return jnp.fft.irfft(out, n=n_out, axis=1) * (n_out / x.shape[1])


class FNO1d(base.Arch):
    """1-D FNO over (B, N, C_in) -> scalar head over sampled points
    (reference geofno.py:95)."""

    def __init__(
        self,
        input_key: Tuple[str, ...] = ("input",),
        output_key: Tuple[str, ...] = ("output",),
        modes: int = 64,
        width: int = 64,
        padding: int = 100,
        input_channel: int = 2,
        output_np: int = 2001,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_key)
        self.output_keys = tuple(output_key)
        self.padding = padding
        self.output_np = output_np
        self.fc0 = Linear(input_channel, width, rngs=rngs)
        self.convs = [_Spectral1d(width, modes, rngs=rngs) for _ in range(4)]
        self.ws = [Linear(width, width, rngs=rngs) for _ in range(4)]
        # 5th spectral conv resamples onto the output_np solution grid
        # (reference geofno.py:195-198: conv4 + linear interpolation)
        self.conv_out = _Spectral1d(width, modes, rngs=rngs)
        self.fc1 = Linear(width, 128, rngs=rngs)
        self.fc2 = Linear(128, 1, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        h = self.fc0(x[self.input_keys[0]])  # (B, N, W)
        h = jnp.pad(h, ((0, 0), (0, self.padding), (0, 0)))
        for i in range(4):
            h1 = self.convs[i](h)
            h2 = self.ws[i](h)
            h = jax.nn.gelu(h1 + h2)
        h = h[:, : h.shape[1] - self.padding]
        h1 = self.conv_out(h, out_size=self.output_np)
        h2 = jax.image.resize(h, (h.shape[0], self.output_np, h.shape[2]), "linear")
        h = h1 + h2  # (B, output_np, W)
        h = jax.nn.gelu(self.fc1(h))
        return {self.output_keys[0]: self.fc2(h)}


class _VConv(Module):
    def __init__(self, c_in, c_out, k=3, s=1, *, rngs: Rngs):
        self.conv = Conv(c_in, c_out, (k, k), strides=s, padding="SAME", rngs=rngs)

    def __call__(self, x):
        return jax.nn.leaky_relu(self.conv(x), 0.2)


class VelocityGenerator(base.Arch):
    """InversionNet-style encoder-decoder: seismic gathers (B, C, T, R) ->
    velocity map (B, 1, H, W) (reference velocitygan.py:25)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        in_channels: int = 5,
        out_size: Tuple[int, int] = (70, 70),
        dim: int = 32,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.out_size = tuple(out_size)
        self.enc = [
            _VConv(in_channels, dim, s=2, rngs=rngs),
            _VConv(dim, 2 * dim, s=2, rngs=rngs),
            _VConv(2 * dim, 4 * dim, s=2, rngs=rngs),
            _VConv(4 * dim, 4 * dim, s=2, rngs=rngs),
        ]
        self.dec = [
            _VConv(4 * dim, 2 * dim, rngs=rngs),
            _VConv(2 * dim, dim, rngs=rngs),
        ]
        self.head = Conv(dim, 1, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        h = x[self.input_keys[0]].transpose(0, 2, 3, 1)
        for e in self.enc:
            h = e(h)
        H, W = self.out_size
        h = jax.image.resize(h, (h.shape[0], H // 4, W // 4, h.shape[-1]), "linear")
        for d in self.dec:
            h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[-1]), "nearest")
            h = d(h)
        out = jnp.tanh(self.head(h))
        out = jax.image.resize(out, (out.shape[0], H, W, 1), "linear")
        return {self.output_keys[0]: out.transpose(0, 3, 1, 2)}


class VelocityDiscriminator(base.Arch):
    """Conv critic over velocity maps (reference velocitygan.py:87)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        in_channels: int = 1,
        dim: int = 32,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(1)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.convs = [
            _VConv(in_channels, dim, s=2, rngs=rngs),
            _VConv(dim, 2 * dim, s=2, rngs=rngs),
            _VConv(2 * dim, 4 * dim, s=2, rngs=rngs),
        ]
        self.head = Linear(4 * dim, 1, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        h = x[self.input_keys[0]].transpose(0, 2, 3, 1)
        for c in self.convs:
            h = c(h)
        h = jnp.mean(h, axis=(1, 2))
        return {self.output_keys[0]: self.head(h)}
