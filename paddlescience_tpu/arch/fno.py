"""Fourier Neural Operator family.

TPU-native counterparts of reference ``ppsci/arch/tfnonet.py:13,196,301,408``
(FNONet, TFNO{1,2,3}dNet) and ``ppsci/arch/fno_block.py`` (
FactorizedSpectralConv:542-1045, FNOBlocks:1047, DomainPadding:19).

Design notes (TPU):
  * spectral convs ride ``jnp.fft.rfftn`` (XLA TPU FFT) + one complex einsum
    per spectral corner — the einsum lowers to MXU matmuls over channels;
  * weights are stored as real/imag Param pairs (optimizers see real pytrees);
  * dense parametrization implements the reference's default exactly;
    'cp' stores rank-R outer-product factors, 'tucker' a rank-reduced core +
    per-mode factor matrices (reference fno_block.py:542-1045 via tltorch) —
    both contract in factorized form without materializing dense weights,
    and parameter counts scale with ``rank``.
  * I/O layout matches the reference: (B, C, *spatial) channel-first.
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs

__all__ = ["SpectralConv", "FNOBlocks", "DomainPadding", "FNONet", "TFNO1dNet", "TFNO2dNet", "TFNO3dNet"]


def _np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def _complex_param(rngs: Rngs, shape, scale):
    re = scale * jax.random.normal(rngs.params(), shape)
    im = scale * jax.random.normal(rngs.params(), shape)
    return Param(re), Param(im)


class SpectralConv(Module):
    """N-D spectral convolution keeping ``n_modes`` Fourier modes.

    Reference fno_block.py:542 (FactorizedSpectralConv). Dense weights:
    one complex tensor per spectral corner, contracted over channels.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        n_modes: Sequence[int],
        separable: bool = False,
        factorization: Optional[str] = None,
        rank: float = 1.0,
        fft_norm: str = "forward",
        *,
        rngs: Rngs,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.n_modes = tuple(n_modes)
        self.ndim = len(self.n_modes)
        self.separable = separable
        self.fft_norm = fft_norm
        self.factorization = (factorization or "dense").lower()

        # Reference (neuralop) semantics: ``n_modes[d]`` is the TOTAL mode
        # count kept along axis d — n//2 positive + n//2 negative for full
        # fft axes, n//2+1 coefficients on the rfft (last) axis
        # (reference fno_block.py:720-745 keeps min(size, n_mode) centered
        # modes of a max_n_modes-shaped weight). Earlier rounds kept
        # n_modes[d] PER CORNER (2x the reference capacity at equal config).
        self.corner_modes = tuple(m // 2 for m in self.n_modes[:-1]) + (
            self.n_modes[-1] // 2 + 1,)

        # spectral corners: all +/- combinations for every dim except the
        # last (rfft half-spectrum keeps only positive freqs there)
        self.corners = list(itertools.product(*[(0, 1)] * (self.ndim - 1)))
        scale = 1.0 / (in_channels * out_channels)
        wshape = (
            (in_channels,) + self.corner_modes
            if separable
            else (in_channels, out_channels) + self.corner_modes
        )
        if separable and self.factorization != "dense":
            raise ValueError("separable spectral convs support only dense weights")
        self.rank = float(rank)
        for ci, _ in enumerate(self.corners):
            if self.factorization == "dense" or separable:
                re, im = _complex_param(rngs, wshape, scale)
                setattr(self, f"w{ci}_re", re)
                setattr(self, f"w{ci}_im", im)
            elif self.factorization == "cp":
                # W = sum_r lam_r a_r(I) o b_r(O) o f1_r(m1) o ... (reference
                # fno_block.py:569-609 'factorized' CP contraction)
                R = max(1, int(self.rank * _np_prod(wshape) / max(sum(wshape), 1)))
                self.cp_rank = R
                s = scale ** (1.0 / (2 + self.ndim))
                for fi, dim in enumerate(wshape):
                    re, im = _complex_param(rngs, (dim, R), s)
                    setattr(self, f"w{ci}_f{fi}_re", re)
                    setattr(self, f"w{ci}_f{fi}_im", im)
                setattr(self, f"w{ci}_lam_re", Param(jnp.ones((R,))))
                setattr(self, f"w{ci}_lam_im", Param(jnp.zeros((R,))))
            elif self.factorization == "tucker":
                # W = G x1 A_I x2 A_O x3 F1 ... (reference tltorch TuckerTensor
                # used by fno_block.py:569; mode ranks scale with `rank`)
                tranks = tuple(max(1, int(math.ceil(self.rank * d))) for d in wshape)
                self.tucker_ranks = tranks
                s = scale ** (1.0 / (2 + self.ndim))
                re, im = _complex_param(rngs, tranks, s)
                setattr(self, f"w{ci}_core_re", re)
                setattr(self, f"w{ci}_core_im", im)
                for fi, (dim, r) in enumerate(zip(wshape, tranks)):
                    re, im = _complex_param(rngs, (dim, r), s)
                    setattr(self, f"w{ci}_f{fi}_re", re)
                    setattr(self, f"w{ci}_f{fi}_im", im)
            else:
                raise ValueError(
                    f"unknown factorization '{self.factorization}' (dense|cp|tucker)")

    def _weight(self, ci):
        return getattr(self, f"w{ci}_re") + 1j * getattr(self, f"w{ci}_im")

    def _cfac(self, ci, fi):
        return getattr(self, f"w{ci}_f{fi}_re") + 1j * getattr(self, f"w{ci}_f{fi}_im")

    _MODE_AX = "jklmn"  # einsum letters for up to 5 spatial mode axes

    def _contract(self, ci, xc, wmode_slices):
        """Apply this corner's weight to xc (B, I, *modes) -> (B, O, *modes),
        in factorized form (dense weights are never materialized).
        ``wmode_slices``: per-mode-axis slices into the weight (identity
        except when the input grid is smaller than the configured modes)."""
        mx = self._MODE_AX[: self.ndim]
        if self.separable:
            w = self._weight(ci)[(slice(None),) + wmode_slices]
            return xc * w[None]
        if self.factorization == "dense":
            w = self._weight(ci)[(slice(None), slice(None)) + wmode_slices]
            return jnp.einsum(f"bi{mx},io{mx}->bo{mx}", xc, w)
        if self.factorization == "cp":
            lam = getattr(self, f"w{ci}_lam_re") + 1j * getattr(self, f"w{ci}_lam_im")
            a = self._cfac(ci, 0)  # (I, R)
            b = self._cfac(ci, 1)  # (O, R)
            t = jnp.einsum(f"bi{mx},ir->br{mx}", xc, a)
            for d in range(self.ndim):
                f = self._cfac(ci, 2 + d)[wmode_slices[d]]  # (m_d_eff, R)
                bshape = (1, f.shape[1]) + (1,) * d + (f.shape[0],) + (1,) * (self.ndim - d - 1)
                t = t * f.T.reshape(bshape)
            return jnp.einsum(f"br{mx},or,r->bo{mx}", t, b, lam)
        # tucker: expand core over mode factors -> (rI, rO, *modes), then
        # project channels through A_I / A_O
        core = getattr(self, f"w{ci}_core_re") + 1j * getattr(self, f"w{ci}_core_im")
        a_i = self._cfac(ci, 0)  # (I, rI)
        a_o = self._cfac(ci, 1)  # (O, rO)
        g = core
        for d in range(self.ndim):
            f = self._cfac(ci, 2 + d)[wmode_slices[d]]  # (m_d_eff, r_d)
            g = jnp.moveaxis(jnp.tensordot(g, f, axes=([2 + d], [1])), -1, 2 + d)
        # g: (rI, rO, *modes)
        t = jnp.einsum(f"bi{mx},ip->bp{mx}", xc, a_i)
        return jnp.einsum(f"bp{mx},pq{mx},oq->bo{mx}", t, g, a_o)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, C, *spatial)
        spatial = x.shape[2:]
        fft_axes = tuple(range(2, 2 + self.ndim))
        x_hat = jnp.fft.rfftn(x, axes=fft_axes, norm=self.fft_norm)

        out_shape = (x.shape[0], self.in_channels if self.separable else self.out_channels) + x_hat.shape[2:]
        out_hat = jnp.zeros(out_shape, dtype=x_hat.dtype)

        for ci, corner in enumerate(self.corners):
            slices = [slice(None), slice(None)]
            wslices = []
            for d, sign in enumerate(corner):
                cm = self.corner_modes[d]
                size = spatial[d]
                # clamp to the grid (reference keeps min(size, n_mode)
                # centered modes, fno_block.py:727-736)
                if sign == 0:
                    m = min(cm, (size + 1) // 2)
                    slices.append(slice(0, m))
                    wslices.append(slice(0, m))
                else:
                    m = min(cm, size // 2)
                    slices.append(slice(x_hat.shape[2 + d] - m, None))
                    # high-corner factor rows are frequencies -cm..-1;
                    # the lowest |freq| m of them are the last m rows
                    wslices.append(slice(cm - m, cm))
            m_last = min(self.corner_modes[-1], x_hat.shape[-1])
            slices.append(slice(0, m_last))  # rfft last dim
            wslices.append(slice(0, m_last))
            slices = tuple(slices)
            yc = self._contract(ci, x_hat[slices], tuple(wslices))
            out_hat = out_hat.at[slices].set(yc)

        return jnp.fft.irfftn(out_hat, s=spatial, axes=fft_axes, norm=self.fft_norm)


class _SoftGating(Module):
    """Per-channel learned gate (reference fno_block soft-gating skip)."""

    def __init__(self, channels: int, ndim: int, *, rngs: Rngs):
        shape = (1, channels) + (1,) * ndim
        self.weight = Param(jnp.ones(shape))
        self.bias = Param(jnp.zeros(shape))

    def __call__(self, x):
        return self.weight * x + self.bias


class _ChannelDense(Module):
    """1x1 conv over channel-first tensors: (B, C, *S) -> (B, C', *S)."""

    def __init__(self, in_channels: int, out_channels: int, *, rngs: Rngs):
        scale = math.sqrt(1.0 / in_channels)
        self.weight = Param(scale * jax.random.normal(rngs.params(), (in_channels, out_channels)))
        self.bias = Param(jnp.zeros((out_channels,)))

    def __call__(self, x):
        y = jnp.einsum("bi...,io->bo...", x, self.weight)
        return y + self.bias.reshape((1, -1) + (1,) * (y.ndim - 2))


def _make_skip(kind: str, channels_in: int, channels_out: int, ndim: int, rngs: Rngs):
    kind = (kind or "linear").lower() if not isinstance(kind, tuple) else kind[0]
    if kind == "identity":
        return lambda x: x
    if kind == "linear":
        return _ChannelDense(channels_in, channels_out, rngs=rngs)
    if kind == "soft-gating":
        return _SoftGating(channels_out, ndim, rngs=rngs)
    raise ValueError(f"unknown skip type '{kind}'")


class FNOBlocks(Module):
    """Stack of spectral conv blocks with skips + optional channel MLP
    (reference fno_block.py:1047)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        n_modes: Sequence[int],
        n_layers: int = 4,
        use_mlp: bool = False,
        mlp: Optional[Dict[str, float]] = None,
        non_linearity=jax.nn.gelu,
        fno_skip: str = "linear",
        mlp_skip: str = "soft-gating",
        separable: bool = False,
        factorization: Optional[str] = None,
        rank: float = 1.0,
        fft_norm: str = "forward",
        *,
        rngs: Rngs,
    ):
        self.n_layers = n_layers
        self.ndim = len(n_modes)
        self.non_linearity = non_linearity
        self.use_mlp = use_mlp
        self.convs = [
            SpectralConv(in_channels, out_channels, n_modes, separable, factorization, rank, fft_norm, rngs=rngs)
            for _ in range(n_layers)
        ]
        self.fno_skips = [
            _make_skip(fno_skip, in_channels, out_channels, self.ndim, rngs) for _ in range(n_layers)
        ]
        if use_mlp:
            expansion = (mlp or {}).get("expansion", 0.5)
            hidden = max(int(out_channels * expansion), 1)
            self.mlp_ins = [_ChannelDense(out_channels, hidden, rngs=rngs) for _ in range(n_layers)]
            self.mlp_outs = [_ChannelDense(hidden, out_channels, rngs=rngs) for _ in range(n_layers)]
            self.mlp_skips = [
                _make_skip(mlp_skip, out_channels, out_channels, self.ndim, rngs) for _ in range(n_layers)
            ]

    def __call__(self, x, index: int):
        y = self.convs[index](x) + self.fno_skips[index](x)
        if index < self.n_layers - 1 or self.use_mlp:
            y = self.non_linearity(y)
        if self.use_mlp:
            y_mlp = self.mlp_outs[index](self.non_linearity(self.mlp_ins[index](y)))
            y = y_mlp + self.mlp_skips[index](y)
            if index < self.n_layers - 1:
                y = self.non_linearity(y)
        return y


class DomainPadding(Module):
    """Pad/unpad spatial dims by a fraction (reference fno_block.py:19)."""

    def __init__(self, domain_padding: Union[float, Sequence[float]], mode: str = "one-sided", *, rngs: Rngs = None):
        self.padding = domain_padding
        self.mode = mode
        self._unpad = None

    def pad(self, x):
        ndim = x.ndim - 2
        pads = self.padding if isinstance(self.padding, (list, tuple)) else [self.padding] * ndim
        cfg = [(0, 0), (0, 0)]
        unpad = [slice(None), slice(None)]
        for d, p in enumerate(pads):
            amount = int(round(p * x.shape[2 + d]))
            if self.mode == "one-sided":
                cfg.append((0, amount))
                unpad.append(slice(0, x.shape[2 + d]))
            else:
                cfg.append((amount, amount))
                unpad.append(slice(amount, amount + x.shape[2 + d]))
        self._unpad = tuple(unpad)
        return jnp.pad(x, cfg)

    def unpad(self, x):
        return x[self._unpad]


class FNONet(base.Arch):
    """N-D (tensorized) Fourier neural operator (reference tfnonet.py:13)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        n_modes: Tuple[int, ...],
        hidden_channels: int,
        in_channels: int = 3,
        out_channels: int = 1,
        lifting_channels: int = 256,
        projection_channels: int = 256,
        n_layers: int = 4,
        use_mlp: bool = False,
        mlp: Optional[Dict[str, float]] = None,
        non_linearity=jax.nn.gelu,
        norm: Optional[str] = None,
        preactivation: bool = False,
        fno_skip: str = "linear",
        mlp_skip: str = "soft-gating",
        separable: bool = False,
        factorization: Optional[str] = None,
        rank: float = 1.0,
        joint_factorization: bool = False,
        implementation: str = "factorized",
        domain_padding: Optional[Union[list, float, int]] = None,
        domain_padding_mode: str = "one-sided",
        fft_norm: str = "forward",
        patching_levels: int = 0,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.n_dim = len(n_modes)
        if patching_levels:
            in_channels = in_channels * patching_levels + 1
        self.lifting_in = _ChannelDense(in_channels, lifting_channels, rngs=rngs)
        self.lifting_out = _ChannelDense(lifting_channels, hidden_channels, rngs=rngs)
        self.projection_in = _ChannelDense(hidden_channels, projection_channels, rngs=rngs)
        self.projection_out = _ChannelDense(projection_channels, out_channels, rngs=rngs)
        self.non_linearity = non_linearity
        self.n_layers = n_layers
        self.fno_blocks = FNOBlocks(
            hidden_channels,
            hidden_channels,
            n_modes,
            n_layers,
            use_mlp,
            mlp,
            non_linearity,
            fno_skip,
            mlp_skip,
            separable,
            factorization,
            rank,
            fft_norm,
            rngs=rngs,
        )
        self.domain_padding = (
            DomainPadding(domain_padding, domain_padding_mode)
            if domain_padding is not None
            and (
                (isinstance(domain_padding, (list, tuple)) and sum(domain_padding) > 0)
                or (isinstance(domain_padding, (int, float)) and domain_padding > 0)
            )
            else None
        )

    def forward_tensor(self, x):
        x = self.non_linearity(self.lifting_in(x))
        x = self.lifting_out(x)
        if self.domain_padding is not None:
            x = self.domain_padding.pad(x)
        for index in range(self.n_layers):
            x = self.fno_blocks(x, index)
        if self.domain_padding is not None:
            x = self.domain_padding.unpad(x)
        x = self.non_linearity(self.projection_in(x))
        return self.projection_out(x)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        y = self.concat_to_tensor(x, self.input_keys, axis=1)  # channel-first
        y = self.forward_tensor(y)
        result = {self.output_keys[0]: y}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result


class TFNO1dNet(FNONet):
    """1-D TFNO (reference tfnonet.py:196)."""

    def __init__(self, input_keys, output_keys, n_modes_height: int, hidden_channels: int, **kwargs):
        super().__init__(input_keys, output_keys, (n_modes_height,), hidden_channels, **kwargs)
        self.n_modes_height = n_modes_height


class TFNO2dNet(FNONet):
    """2-D TFNO (reference tfnonet.py:301)."""

    def __init__(self, input_keys, output_keys, n_modes_height: int, n_modes_width: int, hidden_channels: int, **kwargs):
        super().__init__(input_keys, output_keys, (n_modes_height, n_modes_width), hidden_channels, **kwargs)


class TFNO3dNet(FNONet):
    """3-D TFNO (reference tfnonet.py:408)."""

    def __init__(
        self,
        input_keys,
        output_keys,
        n_modes_height: int,
        n_modes_width: int,
        n_modes_depth: int,
        hidden_channels: int,
        **kwargs,
    ):
        super().__init__(
            input_keys, output_keys, (n_modes_height, n_modes_width, n_modes_depth), hidden_channels, **kwargs
        )
