"""Precipitation nowcasting generative models: NowcastNet and DGMR.

Compact TPU-native implementations of
  * NowcastNet (reference ``ppsci/arch/nowcastnet.py``): physics-conditional
    generation — an evolution network predicts motion + intensity fields
    that advect the radar history forward, and a generative U-Net refines.
  * DGMR (reference ``ppsci/arch/dgmr.py``; Ravuri et al., Nature 2021):
    conditioning stack + latent stack + ConvGRU upsampling generator, with
    spatial and temporal discriminators.

Convs run channel-last (NHWC, TPU conv layout); I/O is (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Conv

__all__ = ["NowcastNet", "DGMR", "DGMRDiscriminators"]


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


class _ConvGRUCell(Module):
    def __init__(self, c_in, hidden, *, rngs: Rngs):
        self.conv_zr = Conv(c_in + hidden, 2 * hidden, (3, 3), padding="SAME", rngs=rngs)
        self.conv_h = Conv(c_in + hidden, hidden, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x, h):
        zr = jax.nn.sigmoid(self.conv_zr(jnp.concatenate([x, h], axis=-1)))
        z, r = jnp.split(zr, 2, axis=-1)
        hh = jnp.tanh(self.conv_h(jnp.concatenate([x, r * h], axis=-1)))
        return (1 - z) * h + z * hh


class DGMR(base.Arch):
    """Deep generative model of radar (reference ``ppsci/arch/dgmr.py``):
    a conditioning stack encodes context frames, a **latent conditioning
    stack** maps per-sample noise to the recurrent initial state, and a
    ConvGRU rolls out future frames through pixel-shuffle upsampling.
    ``generation_steps`` independent latent draws give an ensemble (the
    reference draws 6 samples per training step); noise uses an explicit
    PRNG key threaded through ``set_rng`` for determinism."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        forecast_steps: int = 18,
        input_channels: int = 1,
        latent_channels: int = 256,
        context_channels: int = 192,
        num_input_frames: int = 4,
        generation_steps: int = 1,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        from paddlescience_tpu.nn.recurrent import pixel_shuffle

        self._pixel_shuffle = pixel_shuffle
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.forecast_steps = forecast_steps
        self.generation_steps = generation_steps
        cc = context_channels // 4
        lc = max(latent_channels // 8, 8)
        self.noise_ch = max(lc // 4, 4)
        self.cond1 = _ConvBlock(num_input_frames * input_channels, cc, rngs=rngs, s=2)
        self.cond2 = _ConvBlock(cc, 2 * cc, rngs=rngs, s=2)
        # latent conditioning stack: noise (B, h/4, w/4, noise_ch) -> state
        # (reference dgmr LatentConditioningStack)
        self.lat1 = _ConvBlock(self.noise_ch, lc, rngs=rngs)
        self.lat2 = _ConvBlock(lc, 2 * cc, rngs=rngs)
        self.gru = _ConvGRUCell(2 * cc, 2 * cc, rngs=rngs)
        self.out_conv = Conv(2 * cc, 16 * input_channels, (1, 1), rngs=rngs)  # 4x4 pixel shuffle
        self._rng = jax.random.PRNGKey(0)

    def set_rng(self, key):
        self._rng = key

    def _rollout(self, h, noise):
        state = self.lat2(self.lat1(noise))
        frames = []
        for _ in range(self.forecast_steps):
            state = self.gru(h, state)
            up = self._pixel_shuffle(self.out_conv(state), 4)  # (B, H, W, C)
            frames.append(up.transpose(0, 3, 1, 2))
        return jnp.stack(frames, axis=1)  # (B, steps, C, H, W)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        seq = x[self.input_keys[0]]  # (B, T, C, H, W) reference layout
        B, T, C, H, W = seq.shape
        ctx = seq.reshape(B, T * C, H, W).transpose(0, 2, 3, 1)
        h = self.cond2(self.cond1(ctx))
        keys = jax.random.split(self._rng, self.generation_steps)
        samples = [
            self._rollout(h, jax.random.normal(k, (B, h.shape[1], h.shape[2], self.noise_ch)))
            for k in keys
        ]
        out = samples[0] if self.generation_steps == 1 else jnp.stack(samples, 0).mean(0)
        result = {self.output_keys[0]: out}
        if self.generation_steps > 1:
            result["samples"] = jnp.stack(samples, 0)  # (S, B, steps, C, H, W)
        return result


class DGMRDiscriminators(Module):
    """Spatial + temporal hinge discriminators (reference dgmr.py
    SpatialDiscriminator/TemporalDiscriminator, compact conv stacks)."""

    def __init__(self, input_channels: int = 1, hidden: int = 32, *, rngs: Optional[Rngs] = None):
        if rngs is None:
            rngs = Rngs(1)
        self.s1 = _ConvBlock(input_channels, hidden, rngs=rngs, s=2)
        self.s2 = _ConvBlock(hidden, hidden, rngs=rngs, s=2)
        self.t1 = _ConvBlock(2 * input_channels, hidden, rngs=rngs, s=2)
        self.t2 = _ConvBlock(hidden, hidden, rngs=rngs, s=2)
        self.s_head = Conv(hidden, 1, (1, 1), rngs=rngs)
        self.t_head = Conv(hidden, 1, (1, 1), rngs=rngs)

    def __call__(self, frames):
        """frames (B, T, C, H, W) -> (spatial_score, temporal_score) (B,)."""
        B, T, C, H, W = frames.shape
        sp = frames.reshape(B * T, C, H, W).transpose(0, 2, 3, 1)
        s = self.s_head(self.s2(self.s1(sp))).mean(axis=(1, 2, 3)).reshape(B, T).mean(axis=1)
        pairs = jnp.concatenate([frames[:, :-1], frames[:, 1:]], axis=2)  # (B, T-1, 2C, H, W)
        tp = pairs.reshape(B * (T - 1), 2 * C, H, W).transpose(0, 2, 3, 1)
        t = self.t_head(self.t2(self.t1(tp))).mean(axis=(1, 2, 3)).reshape(B, T - 1).mean(axis=1)
        return s, t
