"""AFNONet / PrecipNet — FourCastNet weather surrogates
(reference ``ppsci/arch/afno.py:394,560``).

Patch embedding + AFNO mixer blocks: rfft2 over the patch grid, per-block
complex two-layer MLP in frequency space with soft-shrink sparsification,
irfft2 back. All frequency matmuls are einsums over (block, block_size) —
MXU-friendly; masking the kept modes uses static slicing (no dynamic shapes).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, LayerNorm, Linear
from paddlescience_tpu.utils import initializer

__all__ = ["AFNONet", "PrecipNet"]


def _softshrink(x, lam):
    return jnp.where(x > lam, x - lam, jnp.where(x < -lam, x + lam, 0.0))


class AFNO2D(Module):
    """Adaptive Fourier mixer (reference afno.py:144)."""

    def __init__(
        self,
        hidden_size: int,
        num_blocks: int = 8,
        sparsity_threshold: float = 0.01,
        hard_thresholding_fraction: float = 1.0,
        hidden_size_factor: int = 1,
        scale: float = 0.02,
        *,
        rngs: Rngs,
    ):
        if hidden_size % num_blocks != 0:
            raise ValueError(f"hidden_size({hidden_size}) should be divisible by num_blocks({num_blocks}).")
        self.hidden_size = hidden_size
        self.num_blocks = num_blocks
        self.block_size = hidden_size // num_blocks
        self.sparsity_threshold = sparsity_threshold
        self.hard_thresholding_fraction = hard_thresholding_fraction
        bsf = self.block_size * hidden_size_factor
        init = initializer.normal_(0.0, scale)
        self.w1 = Param(init(rngs.params(), (2, num_blocks, self.block_size, bsf)))
        self.b1 = Param(init(rngs.params(), (2, num_blocks, bsf)))
        self.w2 = Param(init(rngs.params(), (2, num_blocks, bsf, self.block_size)))
        self.b2 = Param(init(rngs.params(), (2, num_blocks, self.block_size)))

    def __call__(self, x):
        # x: (B, H, W, C)
        bias = x
        B, H, W, C = x.shape
        xf = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
        xf = xf.reshape(B, H, W // 2 + 1, self.num_blocks, self.block_size)

        total_modes = H // 2 + 1
        kept = int(total_modes * self.hard_thresholding_fraction)
        st, end = total_modes - kept, total_modes + kept

        xr, xi = jnp.real(xf[:, st:end, :kept]), jnp.imag(xf[:, st:end, :kept])
        o1r = jax.nn.relu(jnp.einsum("xyzbi,bio->xyzbo", xr, self.w1[0]) - jnp.einsum("xyzbi,bio->xyzbo", xi, self.w1[1]) + self.b1[0])
        o1i = jax.nn.relu(jnp.einsum("xyzbi,bio->xyzbo", xi, self.w1[0]) + jnp.einsum("xyzbi,bio->xyzbo", xr, self.w1[1]) + self.b1[1])
        o2r = jnp.einsum("xyzbi,bio->xyzbo", o1r, self.w2[0]) - jnp.einsum("xyzbi,bio->xyzbo", o1i, self.w2[1]) + self.b2[0]
        o2i = jnp.einsum("xyzbi,bio->xyzbo", o1i, self.w2[0]) + jnp.einsum("xyzbi,bio->xyzbo", o1r, self.w2[1]) + self.b2[1]

        out = jnp.zeros_like(xf)
        kept_c = _softshrink(o2r, self.sparsity_threshold) + 1j * _softshrink(o2i, self.sparsity_threshold)
        out = out.at[:, st:end, :kept].set(kept_c)

        out = out.reshape(B, H, W // 2 + 1, C)
        y = jnp.fft.irfft2(out, s=(H, W), axes=(1, 2), norm="ortho")
        return y + bias


class _Mlp(Module):
    """Two-layer gelu MLP with optional dropout (reference afno.py:108-142)."""

    def __init__(self, in_f, hidden_f, drop: float = 0.0, *, rngs: Rngs):
        self.fc1 = Linear(in_f, hidden_f, rngs=rngs)
        self.fc2 = Linear(hidden_f, in_f, rngs=rngs)
        self.drop = drop

    def __call__(self, x, key=None):
        h = jax.nn.gelu(self.fc1(x))
        if self.drop > 0.0 and key is not None:
            k1, key = jax.random.split(key)
            h = jnp.where(jax.random.bernoulli(k1, 1 - self.drop, h.shape), h / (1 - self.drop), 0.0)
        y = self.fc2(h)
        if self.drop > 0.0 and key is not None:
            y = jnp.where(jax.random.bernoulli(key, 1 - self.drop, y.shape), y / (1 - self.drop), 0.0)
        return y


def _drop_path(x, rate, key):
    """Stochastic depth over the batch axis (reference DropPath afno.py:64-81)."""
    if rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, 0.0)


class _AFNOBlock(Module):
    """LayerNorm -> AFNO mixer (-> +residual if double_skip) -> LayerNorm ->
    MLP -> DropPath -> +residual (reference afno.py:296-356)."""

    def __init__(self, dim, num_blocks, sparsity_threshold, hard_frac, mlp_ratio,
                 drop=0.0, drop_path=0.0, double_skip=True, *, rngs: Rngs):
        self.norm1 = LayerNorm(dim, epsilon=1e-6)
        self.filter = AFNO2D(dim, num_blocks, sparsity_threshold, hard_frac, rngs=rngs)
        self.norm2 = LayerNorm(dim, epsilon=1e-6)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio), drop, rngs=rngs)
        self.double_skip = double_skip
        self.drop_path = drop_path

    def __call__(self, x, key=None):
        residual = x
        h = self.filter(self.norm1(x))  # filter includes its own +bias
        if self.double_skip:
            h = h + residual
            residual = h
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        y = self.mlp(self.norm2(h), k1)
        y = _drop_path(y, self.drop_path, k2)
        return y + residual


class AFNONet(base.Arch):
    """FourCastNet backbone (reference afno.py:394). I/O (B, C, H, W);
    autoregressive multi-step when num_timestamps > 1."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        img_size: Tuple[int, int] = (720, 1440),
        patch_size: Tuple[int, int] = (8, 8),
        in_channels: int = 20,
        out_channels: int = 20,
        embed_dim: int = 768,
        depth: int = 12,
        mlp_ratio: float = 4.0,
        drop_rate: float = 0.0,
        drop_path_rate: float = 0.0,
        num_blocks: int = 8,
        sparsity_threshold: float = 0.01,
        hard_thresholding_fraction: float = 1.0,
        num_timestamps: int = 1,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.img_size = tuple(img_size)
        self.patch_size = tuple(patch_size)
        self.out_channels = out_channels
        self.num_timestamps = num_timestamps
        self.h = img_size[0] // patch_size[0]
        self.w = img_size[1] // patch_size[1]

        self.patch_proj = Conv(in_channels, embed_dim, patch_size, strides=patch_size, padding="VALID", rngs=rngs)
        n_patches = self.h * self.w
        self.pos_embed = Param(
            initializer.trunc_normal_(0.0, 0.02)(rngs.params(), (1, n_patches, embed_dim))
        )
        # stochastic depth decays linearly over blocks (reference afno.py:472)
        dpr = [float(v) for v in jnp.linspace(0, drop_path_rate, depth)]
        self.blocks = [
            _AFNOBlock(embed_dim, num_blocks, sparsity_threshold, hard_thresholding_fraction,
                       mlp_ratio, drop=drop_rate, drop_path=dpr[i], rngs=rngs)
            for i in range(depth)
        ]
        self.norm = LayerNorm(embed_dim, epsilon=1e-6)
        self.head = Linear(embed_dim, out_channels * patch_size[0] * patch_size[1], bias=False, rngs=rngs)

    def forward_tensor(self, x):
        # x: (B, C, H, W)
        B = x.shape[0]
        h = self.patch_proj(x.transpose(0, 2, 3, 1))  # (B, h, w, E)
        h = h.reshape(B, -1, h.shape[-1]) + self.pos_embed
        h = h.reshape(B, self.h, self.w, -1)
        for block in self.blocks:
            h = block(h)
        h = self.head(self.norm(h))  # (B, h, w, C*p*p)
        ph, pw = self.patch_size
        h = h.reshape(B, self.h, self.w, ph, pw, self.out_channels)
        h = h.transpose(0, 5, 1, 3, 2, 4).reshape(B, self.out_channels, self.h * ph, self.w * pw)
        return h

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        inp = x[self.input_keys[0]]
        result = {}
        for i in range(self.num_timestamps):
            out = self.forward_tensor(inp)
            result[self.output_keys[i]] = out
            inp = out
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result


class PrecipNet(base.Arch):
    """Precipitation head over a (frozen) AFNONet backbone
    (reference afno.py:560)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        wind_model: AFNONet,
        img_size: Tuple[int, int] = (720, 1440),
        patch_size: Tuple[int, int] = (8, 8),
        in_channels: int = 20,
        out_channels: int = 1,
        embed_dim: int = 768,
        depth: int = 12,
        mlp_ratio: float = 4.0,
        num_blocks: int = 8,
        num_timestamps: int = 1,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(1)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.num_timestamps = num_timestamps
        self.wind_model = wind_model
        self.backbone = AFNONet(
            ("x",),
            ("y",),
            img_size=img_size,
            patch_size=patch_size,
            in_channels=in_channels,
            out_channels=out_channels,
            embed_dim=embed_dim,
            depth=depth,
            mlp_ratio=mlp_ratio,
            num_blocks=num_blocks,
            rngs=rngs,
        )
        # periodic-pad + 3x3 conv + relu precipitation head
        # (reference PeriodicPad2d afno.py:86 + conv head :644-648)
        self.conv = Conv(out_channels, out_channels, (3, 3), padding="VALID", rngs=rngs)

    def forward_tensor(self, x):
        h = self.backbone.forward_tensor(x)  # (B, C, H, W)
        h = h.transpose(0, 2, 3, 1)  # (B, H, W, C)
        # circular in longitude (W), zero in latitude (H)
        h = jnp.concatenate([h[:, :, -1:], h, h[:, :, :1]], axis=2)
        h = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (0, 0)))
        h = jax.nn.relu(self.conv(h))
        return h.transpose(0, 3, 1, 2)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        inp = x[self.input_keys[0]]
        result = {}
        for i in range(self.num_timestamps):
            # wind backbone is frozen during precip training (reference
            # afno.py:676 no_grad + wind_model.eval())
            wind = jax.lax.stop_gradient(self.wind_model.forward_tensor(inp))
            result[self.output_keys[i]] = self.forward_tensor(wind)
            inp = wind
        return result
