"""NowcastNet — physics-conditional precipitation nowcasting at reference
fidelity (reference ``ppsci/arch/nowcastnet.py:24-545``; Zhang et al.,
Nature 2023). DGMR lives in ``arch/dgmr.py``.

Two-path design, matching the reference component-for-component:
  * **Evolution network** (reference :143-191): a shared U-Net encoder with
    TWO decoders — an intensity decoder (zero-init gamma gate, :161-168) and
    a motion decoder producing a 2-channel flow per prediction step; frames
    advect by iterative ``warp`` (nearest, border padding, :120-125).
  * **Generative network**: ``Generative_Encoder`` (:315-329) over
    [input frames ; evolution result], ``Noise_Projector`` (:458-519)
    lifting N(0,1) noise to depth-to-space features, and a
    ``Generative_Decoder`` (:332-420) of SPADE-conditioned GenBlocks —
    the evolution result modulates every block through SPADE instance
    normalization (:423-455).

Convs run channel-last (NHWC, TPU layout); I/O keeps the reference contract
(B, T, H, W, C) in / (B, pred_length, H, W, 1) out. Spectral norm is the
fixed-u power iteration from ``arch/dgmr.py``; bilinear upsampling uses
jax.image.resize (half-pixel centers vs the reference's align_corners —
a fresh-training nuance, not a structural one).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.arch.dgmr import BatchNorm, SNConv
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, InstanceNorm

__all__ = ["NowcastNet"]


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="linear")


def _max_pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _adaptive_avg_pool(x, out_hw):
    """Channel-last adaptive mean pool for integer ratios (reference
    adaptive_avg_pool2d, nowcastnet.py:450)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    return x.reshape(B, oh, H // oh, ow, W // ow, C).mean(axis=(2, 4))


def warp(field, flow, mode="nearest"):
    """Backward warp (B, H, W, C) by flow (B, H, W, 2) in pixel units with
    border padding (reference warp + make_grid, nowcastnet.py:522-545;
    flow channel 0 = x/width offset, 1 = y/height offset)."""
    B, H, W, C = field.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype), jnp.arange(W, dtype=flow.dtype), indexing="ij")
    sx = jnp.clip(gx[None] + flow[..., 0], 0, W - 1)
    sy = jnp.clip(gy[None] + flow[..., 1], 0, H - 1)
    b_idx = jnp.arange(B)[:, None, None]
    if mode == "nearest":
        xi = jnp.round(sx).astype(jnp.int32)
        yi = jnp.round(sy).astype(jnp.int32)
        return field[b_idx, yi, xi]
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    g = lambda yy, xx: field[b_idx, yy, xx]
    return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
            + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx)


class DoubleConv(Module):
    """BN-ReLU-SNConv x2 with a BN-SNConv shortcut (reference :194-237)."""

    def __init__(self, c_in, c_out, kernel=3, mid=None, *, rngs: Rngs):
        mid = mid or c_out
        k = (kernel, kernel)
        self.bn1 = BatchNorm(c_in, rngs=rngs)
        self.conv1 = SNConv(c_in, mid, k, padding="SAME", rngs=rngs)
        self.bn2 = BatchNorm(mid, rngs=rngs)
        self.conv2 = SNConv(mid, c_out, k, padding="SAME", rngs=rngs)
        self.bn_s = BatchNorm(c_in, rngs=rngs)
        self.conv_s = SNConv(c_in, c_out, k, padding="SAME", rngs=rngs)

    def __call__(self, x):
        sc = self.conv_s(self.bn_s(x))
        h = self.conv1(jax.nn.relu(self.bn1(x)))
        h = self.conv2(jax.nn.relu(self.bn2(h)))
        return h + sc


class Down(Module):
    """2x max-pool + DoubleConv (reference :240-250)."""

    def __init__(self, c_in, c_out, kernel=3, *, rngs: Rngs):
        self.conv = DoubleConv(c_in, c_out, kernel, rngs=rngs)

    def __call__(self, x):
        return self.conv(_max_pool2(x))


class Up(Module):
    """Bilinear 2x upsample, concat skip, DoubleConv(mid=in//2)
    (reference :253-279)."""

    def __init__(self, c_in, c_out, kernel=3, *, rngs: Rngs):
        self.conv = DoubleConv(c_in, c_out, kernel, mid=c_in // 2, rngs=rngs)

    def __call__(self, x1, x2):
        x1 = _upsample2(x1)
        return self.conv(jnp.concatenate([x2, x1], axis=-1))


class EvolutionNetwork(Module):
    """Shared U-Net encoder + intensity and motion decoders
    (reference :143-191). Returns (intensity (B,H,W,P), motion (B,H,W,2P))."""

    def __init__(self, n_channels, n_classes, base_c=32, *, rngs: Rngs):
        c = base_c
        self.inc = DoubleConv(n_channels, c, rngs=rngs)
        self.down1 = Down(c, 2 * c, rngs=rngs)
        self.down2 = Down(2 * c, 4 * c, rngs=rngs)
        self.down3 = Down(4 * c, 8 * c, rngs=rngs)
        self.down4 = Down(8 * c, 8 * c, rngs=rngs)  # bilinear: 16//factor==8
        self.up1 = Up(16 * c, 4 * c, rngs=rngs)
        self.up2 = Up(8 * c, 2 * c, rngs=rngs)
        self.up3 = Up(4 * c, c, rngs=rngs)
        self.up4 = Up(2 * c, c, rngs=rngs)
        self.outc = Conv(c, n_classes, (1, 1), rngs=rngs)
        self.gamma = Param(jnp.zeros((1, 1, 1, n_classes)))  # zero-init gate (:161-168)
        self.up1_v = Up(16 * c, 4 * c, rngs=rngs)
        self.up2_v = Up(8 * c, 2 * c, rngs=rngs)
        self.up3_v = Up(4 * c, c, rngs=rngs)
        self.up4_v = Up(2 * c, c, rngs=rngs)
        self.outc_v = Conv(c, n_classes * 2, (1, 1), rngs=rngs)

    def __call__(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        h = self.up1(x5, x4)
        h = self.up2(h, x3)
        h = self.up3(h, x2)
        h = self.up4(h, x1)
        intensity = self.outc(h) * self.gamma
        v = self.up1_v(x5, x4)
        v = self.up2_v(v, x3)
        v = self.up3_v(v, x2)
        v = self.up4_v(v, x1)
        motion = self.outc_v(v)
        return intensity, motion


class GenerativeEncoder(Module):
    """DoubleConv + 3 Downs -> (H/8, 8*base_c) (reference :315-329)."""

    def __init__(self, n_channels, base_c=64, *, rngs: Rngs):
        c = base_c
        self.inc = DoubleConv(n_channels, c, rngs=rngs)
        self.down1 = Down(c, 2 * c, rngs=rngs)
        self.down2 = Down(2 * c, 4 * c, rngs=rngs)
        self.down3 = Down(4 * c, 8 * c, rngs=rngs)

    def __call__(self, x):
        return self.down3(self.down2(self.down1(self.inc(x))))


class SPADE(Module):
    """Spatially-adaptive denormalization conditioned on the evolution
    result (reference :423-455; the instance norm is parameter-free)."""

    def __init__(self, norm_nc, label_nc, *, rngs: Rngs):
        self.epsilon = 1e-5
        nhidden = 64
        self.mlp_shared = Conv(label_nc, nhidden, (3, 3), padding="SAME", rngs=rngs)
        self.mlp_gamma = Conv(nhidden, norm_nc, (3, 3), padding="SAME", rngs=rngs)
        self.mlp_beta = Conv(nhidden, norm_nc, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x, evo):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normalized = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        evo = _adaptive_avg_pool(evo, x.shape[1:3])
        actv = jax.nn.relu(self.mlp_shared(evo))
        return normalized * (1 + self.mlp_gamma(actv)) + self.mlp_beta(actv)


class GenBlock(Module):
    """SPADE residual block (reference :368-420)."""

    def __init__(self, fin, fout, evo_ic, double_conv=False, *, rngs: Rngs):
        self.learned_shortcut = fin != fout
        fmid = min(fin, fout)
        self.double = double_conv
        self.conv_0 = SNConv(fin, fmid, (3, 3), padding="SAME", rngs=rngs)
        self.conv_1 = SNConv(fmid, fout, (3, 3), padding="SAME", rngs=rngs)
        self.norm_0 = SPADE(fin, evo_ic, rngs=rngs)
        self.norm_1 = SPADE(fmid, evo_ic, rngs=rngs)
        if self.learned_shortcut:
            self.conv_s = SNConv(fin, fout, (1, 1), bias=False, rngs=rngs)
            self.norm_s = SPADE(fin, evo_ic, rngs=rngs)

    def __call__(self, x, evo):
        act = lambda v: jax.nn.leaky_relu(v, 0.2)
        x_s = self.conv_s(self.norm_s(x, evo)) if self.learned_shortcut else x
        dx = self.conv_0(act(self.norm_0(x, evo)))
        if self.double:
            dx = self.conv_1(act(self.norm_1(dx, evo)))
        return x_s + dx


class GenerativeDecoder(Module):
    """SPADE GenBlock stack with 3 upsamples H/8 -> H (reference :332-365)."""

    def __init__(self, ngf, ic_feature, evo_ic, gen_oc, *, rngs: Rngs):
        nf = ngf
        self.fc = Conv(ic_feature, 8 * nf, (3, 3), padding="SAME", rngs=rngs)
        self.head_0 = GenBlock(8 * nf, 8 * nf, evo_ic, rngs=rngs)
        self.G_middle_0 = GenBlock(8 * nf, 4 * nf, evo_ic, double_conv=True, rngs=rngs)
        self.G_middle_1 = GenBlock(4 * nf, 4 * nf, evo_ic, double_conv=True, rngs=rngs)
        self.up_0 = GenBlock(4 * nf, 2 * nf, evo_ic, rngs=rngs)
        self.up_1 = GenBlock(2 * nf, nf, evo_ic, double_conv=True, rngs=rngs)
        self.up_2 = GenBlock(nf, nf, evo_ic, double_conv=True, rngs=rngs)
        self.conv_img = Conv(nf, gen_oc, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x, evo):
        x = self.fc(x)
        x = self.head_0(x, evo)
        x = _upsample2(x)
        x = self.G_middle_0(x, evo)
        x = self.G_middle_1(x, evo)
        x = _upsample2(x)
        x = self.up_0(x, evo)
        x = _upsample2(x)
        x = self.up_1(x, evo)
        x = self.up_2(x, evo)
        return self.conv_img(jax.nn.leaky_relu(x, 0.2))


class ProjBlock(Module):
    """Channel-growing residual conv block (reference :484-519)."""

    def __init__(self, c_in, c_out, *, rngs: Rngs):
        self.one_conv = SNConv(c_in, c_out - c_in, (1, 1), rngs=rngs)
        self.conv1 = SNConv(c_in, c_out, (3, 3), padding="SAME", rngs=rngs)
        self.conv2 = SNConv(c_out, c_out, (3, 3), padding="SAME", rngs=rngs)

    def __call__(self, x):
        x1 = jnp.concatenate([x, self.one_conv(x)], axis=-1)
        x2 = self.conv2(jax.nn.relu(self.conv1(x)))
        return x1 + x2


class NoiseProjector(Module):
    """Noise (B, h/32, w/32, ngf) -> (B, h/32, w/32, 32*ngf)
    (reference :458-481)."""

    def __init__(self, ngf, *, rngs: Rngs):
        self.conv_first = SNConv(ngf, 2 * ngf, (3, 3), padding="SAME", rngs=rngs)
        self.L1 = ProjBlock(2 * ngf, 4 * ngf, rngs=rngs)
        self.L2 = ProjBlock(4 * ngf, 8 * ngf, rngs=rngs)
        self.L3 = ProjBlock(8 * ngf, 16 * ngf, rngs=rngs)
        self.L4 = ProjBlock(16 * ngf, 32 * ngf, rngs=rngs)

    def __call__(self, x):
        return self.L4(self.L3(self.L2(self.L1(self.conv_first(x)))))


class NowcastNet(base.Arch):
    """Evolution network + SPADE generative network (reference
    nowcastnet.py:24-140). Input (B, T, H, W, C>=1) (first channel is the
    radar field); output (B, total_length - input_length, H, W, 1)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        input_length: int = 9,
        total_length: int = 29,
        image_height: int = 512,
        image_width: int = 512,
        image_ch: int = 2,
        ngf: int = 32,
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
        self.ngf = ngf
        self.evo_net = EvolutionNetwork(input_length, self.pred_length, base_c=32, rngs=rngs)
        self.gen_enc = GenerativeEncoder(total_length, base_c=ngf, rngs=rngs)
        self.gen_dec = GenerativeDecoder(ngf, ngf * 10, self.pred_length, self.pred_length, rngs=rngs)
        self.proj = NoiseProjector(ngf, rngs=rngs)
        self._rng = jax.random.PRNGKey(0)

    def set_rng(self, key) -> None:
        self._rng = key

    def forward_tensor(self, x):
        # x: (B, T, H, W, C); radar field = channel 0 (reference :105)
        frames = x[..., 0]  # (B, T, H, W)
        B, T, H, W = frames.shape
        input_frames = frames[:, : self.input_length].transpose(0, 2, 3, 1)  # (B, H, W, T_in)

        intensity, motion = self.evo_net(input_frames)
        motion = motion.reshape(B, H, W, self.pred_length, 2)
        series = []
        last = frames[:, self.input_length - 1][..., None]  # (B, H, W, 1)
        for i in range(self.pred_length):
            last = warp(last, motion[..., i, :], mode="nearest") + intensity[..., i : i + 1]
            series.append(last)
        evo_result = jnp.concatenate(series, axis=-1) / 128.0  # (B, H, W, P) (:126-127)

        evo_feature = self.gen_enc(jnp.concatenate([input_frames, evo_result], axis=-1))
        noise = jax.random.normal(self._rng, (B, H // 32, W // 32, self.ngf), x.dtype)
        noise = self.proj(noise)  # (B, h/32, w/32, 32*ngf)
        # depth-to-space 4x: (32*ngf)/16 channels at H/8 (reference :133-137)
        nh, nw, nc = noise.shape[1], noise.shape[2], noise.shape[3]
        noise = noise.reshape(B, nh, nw, 4, 4, nc // 16)
        noise = noise.transpose(0, 1, 3, 2, 4, 5).reshape(B, nh * 4, nw * 4, nc // 16)
        feature = jnp.concatenate([evo_feature, noise], axis=-1)  # ngf*8 + ngf*2 = ngf*10
        gen = self.gen_dec(feature, evo_result)  # (B, H, W, P)
        return gen.transpose(0, 3, 1, 2)[..., None]  # (B, P, H, W, 1)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        out = self.forward_tensor(x[self.input_keys[0]])
        y = {self.output_keys[0]: out}
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y
