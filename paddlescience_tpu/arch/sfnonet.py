"""SFNONet — Spherical Fourier Neural Operator
(reference ``ppsci/arch/sfnonet.py:390`` built on the vendored
paddle_harmonics SHT; here on ``arch/sht.py``).

Spherical convolution: RealSHT analysis → per-(l,m) complex channel mixing
→ inverse SHT. Reuses the FNO lifting/projection/skip scaffolding.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.arch.fno import DomainPadding, _ChannelDense, _make_skip
from paddlescience_tpu.arch.sht import InverseRealSHT, RealSHT
from paddlescience_tpu.nn.core import Module, Param, Rngs

__all__ = ["SphericalConv", "SFNONet"]


class SphericalConv(Module):
    """SHT-space spectral convolution (reference sfnonet.py SphericalConv)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        n_modes: Tuple[int, int],
        nlat: int,
        nlon: int,
        grid: str = "equiangular",
        separable: bool = False,
        *,
        rngs: Rngs,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        lmax, mmax = n_modes
        self.lmax, self.mmax = lmax, mmax
        self.sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        self.isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        scale = 1.0 / (in_channels * out_channels)
        self.w_re = Param(scale * jax.random.normal(rngs.params(), (in_channels, out_channels, lmax, mmax)))
        self.w_im = Param(scale * jax.random.normal(rngs.params(), (in_channels, out_channels, lmax, mmax)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, C, nlat, nlon)
        coeffs = self.sht(x)  # (B, C, lmax, mmax) complex
        w = self.w_re + 1j * self.w_im
        mixed = jnp.einsum("bilm,iolm->bolm", coeffs, w)
        return self.isht(mixed)


class SFNONet(base.Arch):
    """Spherical FNO for fields on the sphere; I/O (B, C, nlat, nlon)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        n_modes: Tuple[int, int],
        hidden_channels: int,
        in_channels: int = 3,
        out_channels: int = 1,
        lifting_channels: int = 256,
        projection_channels: int = 256,
        n_layers: int = 4,
        img_size: Tuple[int, int] = (180, 360),
        grid: str = "equiangular",
        use_mlp: bool = False,
        mlp: Optional[Dict[str, float]] = None,
        non_linearity=jax.nn.gelu,
        fno_skip: str = "linear",
        separable: bool = False,
        factorization: Optional[str] = None,
        rank: float = 1.0,
        domain_padding=None,
        domain_padding_mode: str = "one-sided",
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        nlat, nlon = img_size
        self.n_layers = n_layers
        self.non_linearity = non_linearity
        self.lifting_in = _ChannelDense(in_channels, lifting_channels, rngs=rngs)
        self.lifting_out = _ChannelDense(lifting_channels, hidden_channels, rngs=rngs)
        self.projection_in = _ChannelDense(hidden_channels, projection_channels, rngs=rngs)
        self.projection_out = _ChannelDense(projection_channels, out_channels, rngs=rngs)
        self.convs = [
            SphericalConv(hidden_channels, hidden_channels, tuple(n_modes), nlat, nlon, grid, separable, rngs=rngs)
            for _ in range(n_layers)
        ]
        self.skips = [_make_skip(fno_skip, hidden_channels, hidden_channels, 2, rngs) for _ in range(n_layers)]
        self.use_mlp = use_mlp
        if use_mlp:
            expansion = (mlp or {}).get("expansion", 0.5)
            hidden = max(int(hidden_channels * expansion), 1)
            self.mlp_ins = [_ChannelDense(hidden_channels, hidden, rngs=rngs) for _ in range(n_layers)]
            self.mlp_outs = [_ChannelDense(hidden, hidden_channels, rngs=rngs) for _ in range(n_layers)]

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        h = self.concat_to_tensor(x, self.input_keys, axis=1)
        h = self.lifting_out(self.non_linearity(self.lifting_in(h)))
        for i in range(self.n_layers):
            y = self.convs[i](h) + self.skips[i](h)
            if i < self.n_layers - 1:
                y = self.non_linearity(y)
            if self.use_mlp:
                y = y + self.mlp_outs[i](self.non_linearity(self.mlp_ins[i](y)))
            h = y
        h = self.projection_out(self.non_linearity(self.projection_in(h)))
        result = {self.output_keys[0]: h}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
