"""LNO — Laplace Neural Operator (reference ``ppsci/arch/lno.py:31,190``).

Pole-residue transient-response operator: the Laplace layer represents the
system transfer function by learned complex poles (per dimension) and
residues; the steady-state part comes back through an inverse FFT, the
transient part through explicit exp(pole * t) terms. Complex weights are
real/imag Param pairs; contractions are einsums over channels (MXU).
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.arch import activation as act_mod
from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Buffer, Module, Param, Rngs
from paddlescience_tpu.nn.layers import InstanceNorm, Linear

__all__ = ["Laplace", "LNO"]

_CHAR1 = "pqr"
_CHAR2 = "mnk"


class Laplace(Module):
    """N-D pole-residue Laplace operator (reference lno.py:31)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        modes: Tuple[int, ...],
        T: np.ndarray,
        data: Tuple[np.ndarray, ...] = (),
        *,
        rngs: Rngs,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.modes = tuple(modes)
        self.dims = len(modes)
        scale = 1.0 / (in_channels * out_channels)

        def u(shape):
            return scale * jax.random.uniform(rngs.params(), shape)

        for i in range(self.dims):
            setattr(self, f"pole{i}_re", Param(u((in_channels, out_channels, modes[i]))))
            setattr(self, f"pole{i}_im", Param(u((in_channels, out_channels, modes[i]))))
        res_shape = (in_channels, out_channels) + self.modes
        self.residue_re = Param(u(res_shape))
        self.residue_im = Param(u(res_shape))

        # grids: T (1, nt), data: per extra dim (1, n_i)
        t_lst = (np.asarray(T),) + tuple(np.asarray(d) for d in data)
        for i, t_i in enumerate(t_lst):
            t_i = t_i.reshape(1, -1)
            setattr(self, f"t_{i}", Buffer(jnp.asarray(t_i, jnp.float32)))
            dt = float(t_i[0, 1] - t_i[0, 0])
            omega = np.fft.fftfreq(t_i.shape[1], d=dt) * 2 * np.pi
            setattr(self, f"lam_{i}", Buffer(jnp.asarray(omega, jnp.float32)))

        c1, c2 = _CHAR1[: self.dims], _CHAR2[: self.dims]
        terms = [f"{c1[i]}io{c2[i]}" for i in range(self.dims)]
        self.eq1 = f"bi{c1},io{c2}," + ",".join(terms) + f"->bo{c1}"
        self.eq2 = f"bi{c1},io{c2}," + ",".join(terms) + f"->bo{c2}"
        terms_x2 = [f"io{c2[i]}{c1[i]}" for i in range(self.dims)]
        # residue2 channel axis is out_channels; valid since LNO uses in==out
        self.eq_x2 = f"bi{c2}," + ",".join(terms_x2) + f"->bo{c1}"

    def _pole(self, i):
        return getattr(self, f"pole{i}_re") + 1j * getattr(self, f"pole{i}_im")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, C, *spatial) with self.dims spatial axes
        spatial = x.shape[2:]
        axes = tuple(range(2, 2 + self.dims))
        alpha = jnp.fft.fftn(x, axes=axes)

        residue = self.residue_re + 1j * self.residue_im
        terms = []
        for i in range(self.dims):
            lam = 1j * getattr(self, f"lam_{i}")  # (n_i,)
            pole = self._pole(i)  # (in, out, m_i)
            terms.append(1.0 / (lam[:, None, None, None] - pole[None]))  # (n_i, in, out, m_i)

        out_res1 = jnp.einsum(self.eq1, alpha, residue, *terms)
        out_res2 = ((-1) ** self.dims) * jnp.einsum(self.eq2, alpha, residue, *terms)

        x1 = jnp.real(jnp.fft.ifftn(out_res1, s=spatial, axes=axes))

        exp_terms = []
        for i in range(self.dims):
            t_i = getattr(self, f"t_{i}").astype(jnp.complex64).reshape(1, -1)  # (1, n_i)
            term = jnp.einsum(
                f"io{_CHAR2[i]},d{_CHAR1[i]}->io{_CHAR2[i]}{_CHAR1[i]}", self._pole(i), t_i
            )
            exp_terms.append(jnp.exp(term))

        x2 = jnp.real(jnp.einsum(self.eq_x2, out_res2, *exp_terms))
        x2 = x2 / reduce(lambda a, b: a * b, spatial, 1)
        return x1 + x2


class LNO(base.Arch):
    """Laplace Neural Operator net (reference lno.py:190)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        width: int,
        modes: Tuple[int, ...],
        T: np.ndarray,
        data: Optional[Tuple[np.ndarray, ...]] = None,
        in_features: int = 1,
        hidden_features: int = 64,
        activation: str = "sin",
        use_norm: bool = True,
        use_grid: bool = False,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.width = width
        self.modes = tuple(modes)
        self.dims = len(modes)
        if self.dims > 3:
            raise ValueError("Only 3 dims and lower of modes are supported now.")
        data = data or ()
        if self.dims != len(data) + 1:
            raise ValueError(f"Dims of modes is {self.dims} but only {len(data)} dims(except T) of data received.")

        self.fc0 = Linear(in_features, width, rngs=rngs)
        self.laplace = Laplace(width, width, self.modes, T, tuple(data), rngs=rngs)
        # 1x1 conv over channels == channel dense on channel-first layout
        scale = math.sqrt(1.0 / width)
        self.conv_w = Param(scale * jax.random.normal(rngs.params(), (width, width)))
        self.conv_b = Param(jnp.zeros((width,)))
        self.use_norm = use_norm
        if use_norm:
            self.norm_eps = 1e-5
        self.fc1 = Linear(width, hidden_features, rngs=rngs)
        self.fc2 = Linear(hidden_features, 1, rngs=rngs)
        self.act = act_mod.get_activation(activation)
        self.use_grid = use_grid

    def _norm(self, x):
        """InstanceNorm without affine params over channel-first layout."""
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.norm_eps)

    def forward_tensor(self, x):
        # x: (B, *spatial, in_features) channel-last at I/O like reference fc0
        x = self.fc0(x)  # (B, *spatial, width)
        # to channel-first for the operator
        perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        x = jnp.transpose(x, perm)
        if self.use_norm:
            x1 = self._norm(self.laplace(self._norm(x)))
        else:
            x1 = self.laplace(x)
        x2 = jnp.einsum("bi...,io->bo...", x, self.conv_w) + self.conv_b.reshape(
            (1, -1) + (1,) * (x.ndim - 2)
        )
        x = self.act(x1 + x2)
        # back to channel-last
        inv = (0,) + tuple(range(2, x.ndim)) + (1,)
        x = jnp.transpose(x, inv)
        x = self.act(self.fc1(x))
        return self.fc2(x)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        y = self.concat_to_tensor(x, self.input_keys, axis=-1)
        y = self.forward_tensor(y)
        result = {self.output_keys[0]: y}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
