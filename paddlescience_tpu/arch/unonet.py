"""UNONet — U-shaped neural operator (reference ``ppsci/arch/unonet.py:14``).

FNO blocks with per-layer channel widths, mode counts and spatial scaling
(contracting then expanding path), plus horizontal skip connections
resampled to the current resolution.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.arch.fno import SpectralConv, _ChannelDense, _make_skip
from paddlescience_tpu.nn.core import Module, Rngs

__all__ = ["UNONet"]


def _resample(x, out_spatial):
    """Resize spatial dims of (B, C, *S) to out_spatial (linear)."""
    if tuple(x.shape[2:]) == tuple(out_spatial):
        return x
    return jax.image.resize(x, x.shape[:2] + tuple(out_spatial), "linear")


class UNONet(base.Arch):
    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        in_channels: int,
        out_channels: int,
        hidden_channels: int,
        lifting_channels: int = 256,
        projection_channels: int = 256,
        n_layers: int = 4,
        uno_out_channels: Tuple[int, ...] = None,
        uno_n_modes: Tuple[Tuple[int, ...], ...] = None,
        uno_scalings: Tuple[Tuple[float, ...], ...] = None,
        horizontal_skips_map: Optional[Dict] = None,
        use_mlp: bool = False,
        mlp: Optional[Dict[str, float]] = None,
        non_linearity=jax.nn.gelu,
        fno_skip: str = "linear",
        horizontal_skip: str = "linear",
        mlp_skip: str = "soft-gating",
        separable: bool = False,
        factorization: Optional[str] = None,
        rank: float = 1.0,
        fft_norm: str = "forward",
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        if uno_out_channels is None or uno_n_modes is None or uno_scalings is None:
            raise ValueError("uno_out_channels/uno_n_modes/uno_scalings can not be None")
        if not (len(uno_out_channels) == len(uno_n_modes) == len(uno_scalings) == n_layers):
            raise ValueError("per-layer specs must all have length n_layers")
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.n_dim = len(uno_n_modes[0])
        self.n_layers = n_layers
        self.uno_scalings = [tuple(s) for s in uno_scalings]
        self.non_linearity = non_linearity

        if horizontal_skips_map is None:
            horizontal_skips_map = {n_layers - i - 1: i for i in range(n_layers // 2)}
        self.horizontal_skips_map = horizontal_skips_map

        self.lifting_in = _ChannelDense(in_channels, lifting_channels, rngs=rngs)
        self.lifting_out = _ChannelDense(lifting_channels, hidden_channels, rngs=rngs)

        convs, skips, h_skips = [], [], {}
        c_in = hidden_channels
        for i in range(n_layers):
            extra = uno_out_channels[self.horizontal_skips_map[i]] if i in self.horizontal_skips_map else 0
            convs.append(
                SpectralConv(c_in + extra, uno_out_channels[i], uno_n_modes[i], separable, factorization, rank, fft_norm, rngs=rngs)
            )
            skips.append(_make_skip(fno_skip, c_in + extra, uno_out_channels[i], self.n_dim, rngs))
            if i in self.horizontal_skips_map.values():
                h_skips[str(i)] = _make_skip(horizontal_skip, uno_out_channels[i], uno_out_channels[i], self.n_dim, rngs)
            c_in = uno_out_channels[i]
        self.convs = convs
        self.skips = skips
        self.h_skips = h_skips
        self.projection_in = _ChannelDense(c_in, projection_channels, rngs=rngs)
        self.projection_out = _ChannelDense(projection_channels, out_channels, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        h = self.concat_to_tensor(x, self.input_keys, axis=1)
        h = self.lifting_out(self.non_linearity(self.lifting_in(h)))

        skip_outputs = {}
        for i in range(self.n_layers):
            if i in self.horizontal_skips_map:
                sk = skip_outputs[self.horizontal_skips_map[i]]
                h = jnp.concatenate([h, _resample(sk, h.shape[2:])], axis=1)
            y = self.convs[i](h) + self.skips[i](h)
            out_spatial = tuple(int(round(s * f)) for s, f in zip(y.shape[2:], self.uno_scalings[i]))
            y = _resample(y, out_spatial)
            if i < self.n_layers - 1:
                y = self.non_linearity(y)
            if i in self.horizontal_skips_map.values():
                skip_outputs[i] = self.h_skips[str(i)](y)
            h = y

        h = self.projection_out(self.non_linearity(self.projection_in(h)))
        return {self.output_keys[0]: h}
