"""Precipitation nowcasting: NowcastNet (DGMR lives in ``arch/dgmr.py``).

Compact TPU-native implementations of
  * NowcastNet (reference ``ppsci/arch/nowcastnet.py``): physics-conditional
    generation — an evolution network predicts motion + intensity fields
    that advect the radar history forward, and a generative U-Net refines.

Convs run channel-last (NHWC, TPU conv layout); I/O is (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Conv

__all__ = ["NowcastNet"]


class _ConvBlock(Module):
    def __init__(self, c_in, c_out, *, rngs: Rngs, k=3, s=1):
        self.conv = Conv(c_in, c_out, (k, k), strides=s, padding="SAME", rngs=rngs)

    def __call__(self, x):
        return jax.nn.leaky_relu(self.conv(x), 0.2)


def _warp(field: jnp.ndarray, motion: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp (B, H, W, C) by motion (B, H, W, 2) with bilinear
    gather — the advection operator of NowcastNet's evolution network."""
    B, H, W, C = field.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    sy = jnp.clip(gy[None] - motion[..., 0], 0, H - 1)
    sx = jnp.clip(gx[None] - motion[..., 1], 0, W - 1)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    def gather(yy, xx):
        b_idx = jnp.arange(B)[:, None, None]
        return field[b_idx, yy, xx]

    return (
        gather(y0, x0) * (1 - wy) * (1 - wx)
        + gather(y0, x1) * (1 - wy) * wx
        + gather(y1, x0) * wy * (1 - wx)
        + gather(y1, x1) * wy * wx
    )


class NowcastNet(base.Arch):
    """Evolution (motion+intensity) network + generative refinement U-Net.
    input (B, T_in, H, W, 1) -> output (B, T_out, H, W, 1)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        input_length: int = 9,
        total_length: int = 29,
        image_height: int = 512,
        image_width: int = 512,
        base_channels: int = 32,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.input_length = input_length
        self.pred_length = total_length - input_length
        c = base_channels
        # evolution net: predicts (motion 2ch + intensity 1ch) per pred step
        self.evo1 = _ConvBlock(input_length, c, rngs=rngs)
        self.evo2 = _ConvBlock(c, c, rngs=rngs)
        self.evo_head = Conv(c, 3 * self.pred_length, (3, 3), padding="SAME", rngs=rngs)
        # generative refinement
        self.gen1 = _ConvBlock(input_length + self.pred_length, c, rngs=rngs)
        self.gen2 = _ConvBlock(c, c, rngs=rngs)
        self.gen_head = Conv(c, self.pred_length, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        seq = x[self.input_keys[0]]  # (B, T, H, W, 1)
        hist = seq[:, : self.input_length, :, :, 0].transpose(0, 2, 3, 1)  # (B, H, W, T_in)
        evo = self.evo_head(self.evo2(self.evo1(hist)))  # (B, H, W, 3*P)
        B, H, W, _ = evo.shape
        P = self.pred_length
        motion = evo[..., : 2 * P].reshape(B, H, W, P, 2)
        intensity = evo[..., 2 * P :].reshape(B, H, W, P)

        frames = []
        last = hist[..., -1:]
        for p in range(P):
            advected = _warp(last, motion[..., p, :]) + intensity[..., p : p + 1]
            frames.append(advected)
            last = advected
        evo_frames = jnp.concatenate(frames, axis=-1)  # (B, H, W, P)

        gen_in = jnp.concatenate([hist, evo_frames], axis=-1)
        refined = self.gen_head(self.gen2(self.gen1(gen_in)))  # (B, H, W, P)
        out = (evo_frames + refined).transpose(0, 3, 1, 2)[..., None]  # (B, P, H, W, 1)
        return {self.output_keys[0]: out}
