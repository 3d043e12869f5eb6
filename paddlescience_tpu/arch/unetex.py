"""UNetEx — DeepCFD U-Net with per-output-channel decoders
(reference ``ppsci/arch/unetex.py:176``).

TPU note: the reference uses max_pool2d with returned indices +
max_unpool2d; index-based unpooling scatters poorly on TPU, so downsampling
uses max_pool and upsampling uses 2x nearest resize (the standard U-Net
choice) — same receptive structure, compiler-friendly.
Internally channel-last (NHWC, the TPU-preferred conv layout); I/O is
channel-first (B, C, H, W) for reference parity.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Conv

__all__ = ["UNetEx"]


def _act(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    return {
        "relu": jax.nn.relu,
        "tanh": jnp.tanh,
        "gelu": jax.nn.gelu,
        "sigmoid": jax.nn.sigmoid,
        None: lambda x: x,
    }[name_or_fn]


class _ConvBlock(Module):
    def __init__(self, in_ch, out_ch, kernel_size, layers, activation, *, rngs: Rngs):
        convs = []
        for i in range(layers):
            convs.append(Conv(in_ch if i == 0 else out_ch, out_ch, (kernel_size, kernel_size), padding="SAME", rngs=rngs))
        self.convs = convs
        self.act = _act(activation)

    def __call__(self, x):
        for conv in self.convs:
            x = self.act(conv(x))
        return x


class UNetEx(base.Arch):
    def __init__(
        self,
        input_key: str,
        output_key: str,
        in_channel: int,
        out_channel: int,
        kernel_size: int = 3,
        filters: Tuple[int, ...] = (16, 32, 64),
        layers: int = 3,
        weight_norm: bool = True,
        batch_norm: bool = True,
        activation="relu",
        final_activation=None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        if len(filters) == 0:
            raise ValueError("The filters shouldn't be empty ")
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = (input_key,)
        self.output_keys = (output_key,)
        self.final_activation = _act(final_activation) if final_activation else None
        self.filters = tuple(filters)

        enc = []
        c_in = in_channel
        for f in filters:
            enc.append(_ConvBlock(c_in, f, kernel_size, layers, activation, rngs=rngs))
            c_in = f
        self.encoder_blocks = enc

        # one decoder stack per output channel (DeepCFD design)
        decoders = []
        for _ in range(out_channel):
            dec = []
            rev = list(filters[::-1])
            for i, f in enumerate(rev):
                out_f = rev[i + 1] if i + 1 < len(rev) else rev[-1]
                # input: upsampled (f) + skip (f) channels
                dec.append(_ConvBlock(2 * f, out_f if i + 1 < len(rev) else 1, kernel_size, layers, activation, rngs=rngs))
            decoders.append(dec)
        self.decoder_stacks = [blk for dec in decoders for blk in dec]  # register as children
        self._decoders = decoders

    def encode(self, x):
        skips = []
        for block in self.encoder_blocks:
            x = block(x)
            skips.append(x)
            # 2x2 max pool
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        return x, skips

    def decode(self, x, skips):
        ys = []
        for dec in self._decoders:
            h = x
            sk = list(skips)
            for block in dec:
                skip = sk.pop()
                h = jax.image.resize(h, (h.shape[0], skip.shape[1], skip.shape[2], h.shape[3]), "nearest")
                h = block(jnp.concatenate([skip, h], axis=-1))
            ys.append(h)
        return jnp.concatenate(ys, axis=-1)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        h = x[self.input_keys[0]].transpose(0, 2, 3, 1)  # NCHW -> NHWC
        h, skips = self.encode(h)
        h = self.decode(h, skips)
        if self.final_activation is not None:
            h = self.final_activation(h)
        return {self.output_keys[0]: h.transpose(0, 3, 1, 2)}
