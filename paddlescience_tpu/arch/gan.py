"""tempoGAN generator/discriminator (reference ``ppsci/arch/gan.py:154,258``).

Variant residual conv blocks with per-layer kernel/stride/act configs —
the tempoGAN super-resolution fluid GAN. NHWC internally, NCHW at I/O.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Conv, Linear
from paddlescience_tpu.utils import initializer

__all__ = ["Generator", "Discriminator"]


def _act(name: Optional[str]):
    return {
        "relu": jax.nn.relu,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        None: lambda x: x,
        "none": lambda x: x,
    }[name]


class _VariantResBlock(Module):
    """Conv stack with a shortcut conv added to the output
    (reference gan.py:68)."""

    def __init__(self, in_channel, out_channels, kernel_sizes, strides, use_bns, acts, *, rngs: Rngs):
        convs = []
        c_in = in_channel
        init = initializer.normal_(0.0, 0.04)
        for c_out, k, s in zip(out_channels, kernel_sizes, strides):
            convs.append(Conv(c_in, c_out, (k, k), strides=s, padding="SAME", kernel_init=init, rngs=rngs))
            c_in = c_out
        self.convs = convs
        self.acts = [(_act(a)) for a in acts]
        total_stride = 1
        for s in strides:
            total_stride *= s
        self.shortcut = Conv(
            in_channel, out_channels[-1], (1, 1), strides=total_stride, padding="SAME", kernel_init=init, rngs=rngs
        )

    def __call__(self, x):
        h = x
        for conv, act in zip(self.convs, self.acts):
            h = act(conv(h))
        return h + self.shortcut(x)


class Generator(base.Arch):
    """tempoGAN generator (reference gan.py:154). I/O (B, C, H, W)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        in_channel: int,
        out_channels_tuple: Tuple[Tuple[int, ...], ...],
        kernel_sizes_tuple: Tuple[Tuple[int, ...], ...],
        strides_tuple: Tuple[Tuple[int, ...], ...],
        use_bns_tuple: Tuple[Tuple[bool, ...], ...],
        acts_tuple: Tuple[Tuple[str, ...], ...],
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        blocks = []
        c_in = in_channel
        for i in range(len(out_channels_tuple)):
            blocks.append(
                _VariantResBlock(
                    c_in, out_channels_tuple[i], kernel_sizes_tuple[i], strides_tuple[i], use_bns_tuple[i], acts_tuple[i], rngs=rngs
                )
            )
            c_in = out_channels_tuple[i][-1]
        self.blocks = blocks

    def forward_tensor(self, x):
        h = x.transpose(0, 2, 3, 1)
        for block in self.blocks:
            h = block(h)
        return h.transpose(0, 3, 1, 2)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        y = self.forward_tensor(x[self.input_keys[0]])
        result = {self.output_keys[0]: y}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result


class Discriminator(base.Arch):
    """tempoGAN discriminator (reference gan.py:258): conv pyramid + FC head;
    returns intermediate feature maps + final score per input key."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        in_channel: int,
        out_channels: Tuple[int, ...],
        fc_channel: int,
        kernel_sizes: Tuple[int, ...],
        strides: Tuple[int, ...],
        use_bns: Tuple[bool, ...],
        acts: Tuple[str, ...],
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        init = initializer.normal_(0.0, 0.04)
        convs = []
        c_in = in_channel
        for c_out, k, s in zip(out_channels, kernel_sizes, strides):
            convs.append(Conv(c_in, c_out, (k, k), strides=s, padding="SAME", kernel_init=init, rngs=rngs))
            c_in = c_out
        self.convs = convs
        self.acts = [(_act(a)) for a in acts]
        self.fc = Linear(fc_channel, 1, rngs=rngs)

    def forward_tensor(self, x):
        h = x.transpose(0, 2, 3, 1)
        feats = []
        for conv, act in zip(self.convs, self.acts):
            h = act(conv(h))
            feats.append(h.transpose(0, 3, 1, 2))
        score = self.fc(h.reshape(h.shape[0], -1))
        return feats + [score]

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        outs: List = []
        for key in self.input_keys:
            outs.extend(self.forward_tensor(x[key]))
        result = {k: v for k, v in zip(self.output_keys, outs)}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
