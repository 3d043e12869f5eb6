"""PhyCRNet — physics-informed convolutional-recurrent net at reference
fidelity (reference ``ppsci/arch/phycrnet.py:75-545``).

Encoder conv stack → ConvLSTM → pixel-shuffle decoder, rolled out ``step``
times with an Euler residual connection (x_{t+1} = x_t + dt * f). All convs
use **circular** (periodic wrap) padding — the problems PhyCRNet targets are
periodic (2-D Burgers); the encoder convs are weight-normalized and the
ConvLSTM output gate's bias initializes to 1 (reference :337-343,376-391).

``loss_generator`` provides the fixed finite-difference derivative kernels
(4th-order 5x5 laplace/dx/dy, central 3-point dt) the physics loss uses
(reference :397-545) as pure functions over (T, C, H, W) rollouts.

The time rollout is a Python loop over static steps (unrolled into the
jitted graph; use moderate ``step`` or wrap training in remat for memory).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv
from paddlescience_tpu.nn.recurrent import pixel_shuffle

__all__ = ["PhyCRNet", "loss_generator"]


class _WeightNormConv(Conv):
    """Weight-normalized circular conv (reference utils.weight_norm over the
    encoder convs, phycrnet.py:376-386)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        w = self.weight
        norm = jnp.sqrt(jnp.sum(w * w, axis=tuple(range(w.ndim - 1)), keepdims=True))
        self.wn_g = Param(norm[..., 0, :].reshape(-1))  # (C_out,)
        self.weight = Param(w / (norm + 1e-12))

    def _kernel(self):
        v = self.weight
        norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)), keepdims=True))
        return self.wn_g * v / (norm + 1e-12)


class _EncoderBlock(Module):
    def __init__(self, in_ch, out_ch, k, s, p, *, rngs: Rngs):
        self.conv = _WeightNormConv(in_ch, out_ch, (k, k), strides=s, padding=p,
                                    padding_mode="circular", rngs=rngs)

    def __call__(self, x):
        return jax.nn.relu(self.conv(x))


class ConvLSTMCell(Module):
    """ConvLSTM cell with per-gate circular convs and output-gate bias 1
    (reference phycrnet.py:229-354). Input convs may stride; hidden convs are
    3x3 bias-free. Gates are fused into one 4C conv pair per source — the
    same math with one MXU matmul per source."""

    def __init__(self, input_channels, hidden_channels, input_kernel_size,
                 input_stride=1, input_padding=0, *, rngs: Rngs):
        self.hidden_channels = hidden_channels
        self.input_stride = input_stride
        self.conv_x = Conv(input_channels, 4 * hidden_channels,
                           (input_kernel_size, input_kernel_size),
                           strides=input_stride, padding=input_padding,
                           padding_mode="circular", rngs=rngs)
        self.conv_h = Conv(hidden_channels, 4 * hidden_channels, (3, 3), padding=1,
                           padding_mode="circular", bias=False, rngs=rngs)
        # gate order (i, f, g, o): output-gate bias -> 1 (reference :343)
        b = np.zeros((4 * hidden_channels,), np.float32)
        b[3 * hidden_channels:] = 1.0
        self.conv_x.bias = Param(jnp.asarray(b))

    def __call__(self, x, state):
        h, c = state
        z = self.conv_x(x) + self.conv_h(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)

    def init_state(self, x_shape):
        B, H, W, _ = x_shape
        s = self.input_stride
        shape = (B, H // s, W // s, self.hidden_channels)
        return (jnp.zeros(shape), jnp.zeros(shape))


class PhyCRNet(base.Arch):
    """Reference phycrnet.py:75-226; I/O dict {"initial_state", "input"} ->
    {"outputs", "second_last_state"} with NCHW tensors at the boundary."""

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
            _EncoderBlock(in_chs[i], hidden_channels[i], input_kernel_size[i],
                          input_stride[i], input_padding[i], rngs=rngs)
            for i in range(self.num_encoder)
        ]
        self.convlstm = [
            ConvLSTMCell(in_chs[i], hidden_channels[i], input_kernel_size[i],
                         input_stride[i], input_padding[i], rngs=rngs)
            for i in range(self.num_encoder, self.num_encoder + self.num_convlstm)
        ]
        self.output_layer = Conv(2, 2, (5, 5), padding=2, padding_mode="circular", rngs=rngs)

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
            # Euler residual step (reference :214)
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


# ---------------------------------------------------------- physics loss --

# 4th-order FD kernels (reference phycrnet.py LALP_OP / PARTIAL_X / PARTIAL_Y)
_LALP_OP = np.array(
    [[0, 0, -1 / 12, 0, 0],
     [0, 0, 4 / 3, 0, 0],
     [-1 / 12, 4 / 3, -5, 4 / 3, -1 / 12],
     [0, 0, 4 / 3, 0, 0],
     [0, 0, -1 / 12, 0, 0]], np.float32)
_PARTIAL_X = np.array(
    [[0, 0, 0, 0, 0],
     [0, 0, 0, 0, 0],
     [1 / 12, -8 / 12, 0, 8 / 12, -1 / 12],
     [0, 0, 0, 0, 0],
     [0, 0, 0, 0, 0]], np.float32)
_PARTIAL_Y = _PARTIAL_X.T.copy()


class loss_generator:
    """Fixed FD derivative operators for the PhyCRNet physics loss
    (reference phycrnet.py:471-545): 4th-order 5x5 laplace/dx/dy applied to
    the interior (VALID, matching the reference's unpadded convs) and a
    central 3-point dt along the rollout axis. Operates on (T, C, H, W)."""

    def __init__(self, dt: float, dx: float):
        self.dt = dt
        self.dx = dx

    def _conv2d(self, u, kernel, resol):
        k = jnp.asarray(kernel)[..., None, None]  # (5, 5, 1, 1)
        dn = jax.lax.conv_dimension_numbers(u.shape, k.shape, ("NCHW", "HWIO", "NCHW"))
        # reshape (T, 1, H, W): each field channel is convolved alone
        return jax.lax.conv_general_dilated(u, k, (1, 1), "VALID", dimension_numbers=dn) / resol

    def get_phy_loss(self, output, R: float = 200.0):
        """2-D Burgers residuals (f_u, f_v) of a rollout (T, 2, H, W)
        (reference get_phy_Loss :496-545)."""
        lap_u = self._conv2d(output[1:-1, 0:1], _LALP_OP, self.dx**2)
        lap_v = self._conv2d(output[1:-1, 1:2], _LALP_OP, self.dx**2)
        u_x = self._conv2d(output[1:-1, 0:1], _PARTIAL_X, self.dx)
        u_y = self._conv2d(output[1:-1, 0:1], _PARTIAL_Y, self.dx)
        v_x = self._conv2d(output[1:-1, 1:2], _PARTIAL_X, self.dx)
        v_y = self._conv2d(output[1:-1, 1:2], _PARTIAL_Y, self.dx)
        # central dt over the rollout axis on the matching interior crop
        u_t = (output[2:, 0:1, 2:-2, 2:-2] - output[:-2, 0:1, 2:-2, 2:-2]) / (2 * self.dt)
        v_t = (output[2:, 1:2, 2:-2, 2:-2] - output[:-2, 1:2, 2:-2, 2:-2]) / (2 * self.dt)
        u = output[1:-1, 0:1, 2:-2, 2:-2]
        v = output[1:-1, 1:2, 2:-2, 2:-2]
        f_u = u_t + u * u_x + v * u_y - (1.0 / R) * lap_u
        f_v = v_t + u * v_x + v * v_y - (1.0 / R) * lap_v
        return f_u, f_v
