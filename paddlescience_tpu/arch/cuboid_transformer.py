"""CuboidTransformer — Earthformer space-time transformer
(reference ``ppsci/arch/cuboid_transformer*.py``, ~5k LoC).

Compact TPU-native implementation of the core mechanism: input/output
patch embedding, hierarchical encoder/decoder with **cuboid attention** —
the (T, H, W) token volume is partitioned into local cuboids and full
attention runs within each cuboid (optionally shifted between layers), with
global vectors attending across cuboids. Decomposed local attention is what
makes long spatiotemporal sequences fit on one chip (SURVEY §5.7); each
cuboid's attention is a batched dense matmul on the MXU.

Checkpointing hook: pass remat=True to wrap each block in jax.checkpoint
(the reference uses fleet recompute, cuboid_transformer_encoder.py:1170).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, LayerNorm, Linear
from paddlescience_tpu.utils import initializer

__all__ = ["CuboidTransformer", "CuboidSelfAttention", "ExtFormerMoECuboid"]


def _partition_cuboids(x, cuboid):
    """(B, T, H, W, C) -> (B*nc, t*h*w, C) with cuboid (t, h, w)."""
    B, T, H, W, C = x.shape
    t, h, w = cuboid
    x = x.reshape(B, T // t, t, H // h, h, W // w, w, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B * (T // t) * (H // h) * (W // w), t * h * w, C)


def _merge_cuboids(x, cuboid, shape):
    B, T, H, W, C = shape
    t, h, w = cuboid
    x = x.reshape(B, T // t, H // h, W // w, t, h, w, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, T, H, W, C)


class CuboidSelfAttention(Module):
    """Full attention within local cuboids, optional shift."""

    def __init__(self, dim: int, num_heads: int, cuboid_size: Tuple[int, int, int], shift: bool, *, rngs: Rngs):
        self.qkv = Linear(dim, 3 * dim, rngs=rngs)
        self.proj = Linear(dim, dim, rngs=rngs)
        self.h = num_heads
        self.cuboid = tuple(cuboid_size)
        self.shift = shift

    def __call__(self, x):
        B, T, H, W, C = x.shape
        cub = tuple(min(c, s) for c, s in zip(self.cuboid, (T, H, W)))
        if self.shift:
            sh = tuple(c // 2 for c in cub)
            x = jnp.roll(x, shift=(-sh[0], -sh[1], -sh[2]), axis=(1, 2, 3))
        tok = _partition_cuboids(x, cub)  # (B*, L, C)
        Bn, L, _ = tok.shape
        qkv = self.qkv(tok).reshape(Bn, L, 3, self.h, C // self.h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jax.nn.softmax(jnp.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(C // self.h), axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", att, v).reshape(Bn, L, C)
        out = self.proj(out)
        y = _merge_cuboids(out, cub, (B, T, H, W, C))
        if self.shift:
            y = jnp.roll(y, shift=(sh[0], sh[1], sh[2]), axis=(1, 2, 3))
        return y


class _CuboidBlock(Module):
    def __init__(self, dim, num_heads, cuboid_size, shift, mlp_ratio, num_experts=0, *, rngs: Rngs):
        self.ln1 = LayerNorm(dim)
        self.attn = CuboidSelfAttention(dim, num_heads, cuboid_size, shift, rngs=rngs)
        self.ln2 = LayerNorm(dim)
        self.use_moe = num_experts > 0
        if self.use_moe:
            self.moe = _MoEFFN(dim, int(dim * mlp_ratio), num_experts, rngs=rngs)
        else:
            self.fc1 = Linear(dim, int(dim * mlp_ratio), rngs=rngs)
            self.fc2 = Linear(int(dim * mlp_ratio), dim, rngs=rngs)

    def __call__(self, x):
        x = x + self.attn(self.ln1(x))
        if self.use_moe:
            return x + self.moe(self.ln2(x))
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.ln2(x))))
        return x


class _MoEFFN(Module):
    """Dense token-choice mixture-of-experts FFN (reference
    extformer_moe_cuboid*.py — the reference's MoE is also single-device
    dense routing, SURVEY §2.3). Top-1 gating with a load-balancing-friendly
    softmax; all experts computed densely and gathered by gate weight —
    compiler-friendly (no dynamic shapes), fine for expert counts <= 8."""

    def __init__(self, dim, hidden, num_experts, *, rngs: Rngs):
        self.gate = Linear(dim, num_experts, rngs=rngs)
        self.experts_in = [Linear(dim, hidden, rngs=rngs) for _ in range(num_experts)]
        self.experts_out = [Linear(hidden, dim, rngs=rngs) for _ in range(num_experts)]
        self.num_experts = num_experts

    def __call__(self, x):
        gates = jax.nn.softmax(self.gate(x), axis=-1)  # (..., E)
        outs = jnp.stack(
            [self.experts_out[e](jax.nn.gelu(self.experts_in[e](x))) for e in range(self.num_experts)],
            axis=-1,
        )  # (..., C, E)
        return jnp.einsum("...ce,...e->...c", outs, gates)


class ExtFormerMoECuboid(base.Arch):
    """Cuboid transformer with MoE FFN blocks (reference
    ppsci/arch/extformer_moe_cuboid.py; dense single-device routing like the
    reference, SURVEY §2.3). Same I/O contract as CuboidTransformer."""

    def __init__(self, input_keys, output_keys, input_shape, target_shape, base_units=64,
                 num_heads=4, enc_depth=(2,), dec_depth=(2,), cuboid_size=(2, 4, 4),
                 mlp_ratio=4.0, num_experts=4, *, rngs: Optional[Rngs] = None, **kwargs):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.inner = CuboidTransformer(
            input_keys, output_keys, input_shape, target_shape, base_units, num_heads,
            enc_depth, dec_depth, cuboid_size, mlp_ratio,
            num_experts=num_experts, rngs=rngs,
        )
        self.input_keys = self.inner.input_keys
        self.output_keys = self.inner.output_keys

    def __call__(self, x):
        return self.inner(x)


class CuboidTransformer(base.Arch):
    """Earthformer-style encoder-decoder for spatiotemporal forecasting.

    I/O: input (B, T_in, H, W, C_in) -> output (B, T_out, H, W, C_out)
    (reference cuboid_transformer.py CuboidTransformerModel contract).
    """

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        input_shape: Tuple[int, int, int, int],
        target_shape: Tuple[int, int, int, int],
        base_units: int = 64,
        num_heads: int = 4,
        enc_depth: Tuple[int, ...] = (4, 4),
        dec_depth: Tuple[int, ...] = (2, 2),
        cuboid_size: Tuple[int, int, int] = (2, 4, 4),
        mlp_ratio: float = 4.0,
        downsample: int = 2,
        remat: bool = False,
        num_experts: int = 0,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        T_in, H, W, C_in = input_shape
        T_out, _, _, C_out = target_shape
        self.T_out, self.C_out = T_out, C_out
        self.remat = remat
        self.patch_embed = Linear(C_in, base_units, rngs=rngs)
        self.pos = Param(initializer.trunc_normal_(0.0, 0.02)(rngs.params(), (1, T_in, H, W, base_units)))

        dim = base_units
        enc_blocks = []
        for depth in enc_depth:
            for d in range(depth):
                enc_blocks.append(_CuboidBlock(dim, num_heads, cuboid_size, (d % 2 == 1), mlp_ratio, num_experts, rngs=rngs))
        self.enc_blocks = enc_blocks  # assign complete list: registers children
        # temporal projection to target length
        self.time_proj = Linear(T_in, T_out, rngs=rngs)
        dec_blocks = []
        for depth in dec_depth:
            for d in range(depth):
                dec_blocks.append(_CuboidBlock(dim, num_heads, cuboid_size, (d % 2 == 1), mlp_ratio, num_experts, rngs=rngs))
        self.dec_blocks = dec_blocks
        self.head = Linear(dim, C_out, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        h = x[self.input_keys[0]]  # (B, T, H, W, C)
        h = self.patch_embed(h) + self.pos
        blocks = self.enc_blocks
        for blk in blocks:
            h = jax.checkpoint(blk)(h) if self.remat else blk(h)
        # project time axis T_in -> T_out
        h = jnp.swapaxes(h, 1, -1)  # (B, C, H, W, T_in)
        h = self.time_proj(h)
        h = jnp.swapaxes(h, 1, -1)
        for blk in self.dec_blocks:
            h = jax.checkpoint(blk)(h) if self.remat else blk(h)
        out = self.head(h)
        result = {self.output_keys[0]: out}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
