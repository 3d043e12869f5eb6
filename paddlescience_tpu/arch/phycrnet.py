"""PhyCRNet — physics-informed convolutional-recurrent net
(reference ``ppsci/arch/phycrnet.py:75``).

Encoder conv stack → ConvLSTM → pixel-shuffle decoder, rolled out `step`
times with an Euler residual connection (x_{t+1} = x_t + dt * f). The time
rollout is a Python loop over static steps (unrolled into the jitted graph;
use moderate `step` or wrap training in remat for memory).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Conv
from paddlescience_tpu.nn.recurrent import ConvLSTMCell, pixel_shuffle

__all__ = ["PhyCRNet"]


class _EncoderBlock(Module):
    def __init__(self, in_ch, out_ch, k, s, p, *, rngs: Rngs):
        self.conv = Conv(in_ch, out_ch, (k, k), strides=s, padding=p, rngs=rngs)

    def __call__(self, x):
        return jax.nn.relu(self.conv(x))


class PhyCRNet(base.Arch):
    def __init__(
        self,
        input_channels: int,
        hidden_channels: Tuple[int, ...],
        input_kernel_size: Tuple[int, ...],
        input_stride: Tuple[int, ...],
        input_padding: Tuple[int, ...],
        dt: float,
        num_layers: Tuple[int, ...],
        upscale_factor: int,
        step: int = 1,
        effective_step: Tuple[int, ...] = (1,),
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = ("initial_state", "input")
        self.output_keys = ("outputs", "second_last_state")
        in_chs = [input_channels] + list(hidden_channels)
        self.num_encoder, self.num_convlstm = num_layers[0], num_layers[1]
        self.dt = dt
        self.step = step
        self.effective_step = tuple(effective_step)
        self.upscale_factor = upscale_factor

        self.encoder = [
            _EncoderBlock(in_chs[i], hidden_channels[i], input_kernel_size[i], input_stride[i], input_padding[i], rngs=rngs)
            for i in range(self.num_encoder)
        ]
        self.convlstm = [
            ConvLSTMCell(in_chs[i], hidden_channels[i], input_kernel_size[i], input_stride[i], input_padding[i], rngs=rngs)
            for i in range(self.num_encoder, self.num_encoder + self.num_convlstm)
        ]
        self.output_layer = Conv(2, 2, (5, 5), padding=2, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        initial_state = x["initial_state"]  # list-like of (h, c) channel-first
        xt = x["input"]  # (B, C, H, W)

        internal_state: List = []
        outputs: List = []
        second_last_state: List = []

        h_prev = xt
        for step in range(self.step):
            h = h_prev.transpose(0, 2, 3, 1)  # NCHW -> NHWC
            for enc in self.encoder:
                h = enc(h)
            for i, cell in enumerate(self.convlstm):
                if step == 0:
                    if initial_state is not None and len(initial_state) > i:
                        st = initial_state[i]
                        state = (jnp.asarray(st[0]).transpose(0, 2, 3, 1), jnp.asarray(st[1]).transpose(0, 2, 3, 1))
                    else:
                        state = cell.init_state(h.shape)
                    internal_state.append(state)
                h, new_state = cell(h, internal_state[i])
                internal_state[i] = new_state
            h = pixel_shuffle(h, self.upscale_factor)
            out = self.output_layer(h).transpose(0, 3, 1, 2)
            # Euler residual step
            h_next = h_prev + self.dt * out
            if step in self.effective_step:
                outputs.append(h_next)
            if step == self.step - 2:
                second_last_state = [
                    (s[0].transpose(0, 3, 1, 2), s[1].transpose(0, 3, 1, 2)) for s in internal_state
                ]
            h_prev = h_next

        result = {"outputs": outputs, "second_last_state": second_last_state}
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
