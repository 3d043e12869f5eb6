"""Koopman-operator embedding networks
(reference ``ppsci/arch/embedding_koopman.py:36,215,274``).

Encoder → learned Koopman matrix (diagonal + banded skew-symmetric) →
decoder; the operator advance is one batched matmul (MXU).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Buffer, Module, Param, Rngs
from paddlescience_tpu.nn.layers import LayerNorm, Linear
from paddlescience_tpu.utils import initializer

__all__ = ["LorenzEmbedding", "RosslerEmbedding", "CylinderEmbedding"]


class LorenzEmbedding(base.Arch):
    """Koopman embedding for the Lorenz system (reference embedding_koopman.py:36).

    forward: x (B, T, 3) -> (pred_data (B, T-1, 3), recover_data (B, T, 3),
    koopman_matrix (embed, embed)) under output_keys order.
    """

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        mean: Optional[Tuple[float, ...]] = None,
        std: Optional[Tuple[float, ...]] = None,
        input_size: int = 3,
        hidden_size: int = 500,
        embed_size: int = 32,
        drop: float = 0.0,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.embed_size = embed_size

        init = initializer.linear_init_
        self.enc1 = Linear(input_size, hidden_size, kernel_init=init, rngs=rngs)
        self.enc2 = Linear(hidden_size, embed_size, kernel_init=init, rngs=rngs)
        self.enc_norm = LayerNorm(embed_size)
        self.dec1 = Linear(embed_size, hidden_size, kernel_init=init, rngs=rngs)
        self.dec2 = Linear(hidden_size, input_size, kernel_init=init, rngs=rngs)

        # learned Koopman operator: diagonal + two skew-symmetric bands
        self.k_diag = Param(jnp.linspace(1, 0, embed_size))
        self.k_ut = Param(0.1 * jax.random.uniform(rngs.params(), (2 * embed_size - 3,)))

        mean = [0.0] * input_size if mean is None else list(mean)
        std = [1.0] * input_size if std is None else list(std)
        self.mean = Buffer(jnp.asarray(mean, jnp.float32).reshape(1, input_size))
        self.std = Buffer(jnp.asarray(std, jnp.float32).reshape(1, input_size))

    # -- pieces -----------------------------------------------------------------
    def encoder(self, x):
        x = (x - self.mean) / self.std
        g = self.enc2(jax.nn.relu(self.enc1(x)))
        return self.enc_norm(g)

    def decoder(self, g):
        out = self.dec2(jax.nn.relu(self.dec1(g)))
        return self.std * out + self.mean

    def get_koopman_matrix(self):
        e = self.embed_size
        ut = jnp.diag(self.k_ut[: e - 1], k=1) + jnp.diag(self.k_ut[e - 1 :], k=2)
        return ut - ut.T + jnp.diag(self.k_diag)

    def koopman_operation(self, embed_data, k_matrix):
        # (B, T, E) @ (E, E)^T applied timestep-wise
        return jnp.einsum("bte,fe->btf", embed_data, k_matrix)

    def forward_tensor(self, x):
        k_matrix = self.get_koopman_matrix()
        embed_data = self.encoder(x)
        recover_data = self.decoder(embed_data)
        pred_data = self.decoder(self.koopman_operation(embed_data, k_matrix))
        return (pred_data[:, :-1, :], recover_data, k_matrix)

    @staticmethod
    def split_to_dict(data_tensors, keys):
        return {key: data_tensors[i] for i, key in enumerate(keys)}

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        x_tensor = self.concat_to_tensor(x, self.input_keys, axis=-1)
        y = self.forward_tensor(x_tensor)
        y = self.split_to_dict(y, self.output_keys)
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y


class RosslerEmbedding(LorenzEmbedding):
    """Same architecture for the Rossler system (reference :215)."""


class CylinderEmbedding(base.Arch):
    """Koopman embedding for cylinder wake states (B, T, 3, H, W) with
    viscosity conditioning (reference embedding_koopman.py:274). Conv
    encoder/decoder over channel-last internally, channel-first I/O."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        mean: Optional[Tuple[float, ...]] = None,
        std: Optional[Tuple[float, ...]] = None,
        embed_size: int = 128,
        encoder_channels: Optional[Tuple[int, ...]] = None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        from paddlescience_tpu.nn.layers import Conv

        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.embed_size = embed_size
        channels = encoder_channels or (16, 32, 64, 128)

        convs = []
        c_in = 4  # (u, v, p) + viscosity channel
        for c in channels:
            convs.append(Conv(c_in, c, (3, 3), strides=2, padding="SAME", rngs=rngs))
            c_in = c
        self.enc_convs = convs
        # assume 64x128 input -> downsample 2^4 -> 4x8 spatial
        self.enc_fc = Linear(c_in * 4 * 8, embed_size, rngs=rngs)
        self.enc_norm = LayerNorm(embed_size)

        self.dec_fc = Linear(embed_size, c_in * 4 * 8, rngs=rngs)
        dec_convs = []
        rev = list(channels[::-1][1:]) + [3]
        for c in rev:
            dec_convs.append(Conv(c_in, c, (3, 3), padding="SAME", rngs=rngs))
            c_in = c
        self.dec_convs = dec_convs

        self.k_diag = Param(jnp.linspace(1, 0, embed_size))
        self.k_ut = Param(0.1 * jax.random.uniform(rngs.params(), (2 * embed_size - 3,)))

        mean = [0.0, 0.0, 0.0, 0.0] if mean is None else list(mean)
        std = [1.0, 1.0, 1.0, 1.0] if std is None else list(std)
        self.mean = Buffer(jnp.asarray(mean, jnp.float32).reshape(1, 1, 4, 1, 1))
        self.std = Buffer(jnp.asarray(std, jnp.float32).reshape(1, 1, 4, 1, 1))

    def get_koopman_matrix(self):
        e = self.embed_size
        ut = jnp.diag(self.k_ut[: e - 1], k=1) + jnp.diag(self.k_ut[e - 1 :], k=2)
        return ut - ut.T + jnp.diag(self.k_diag)

    def encoder(self, x, visc):
        B, T = x.shape[0], x.shape[1]
        visc_map = jnp.broadcast_to(visc[:, None, None, None, None], (B, T, 1, x.shape[3], x.shape[4]))
        x = jnp.concatenate([x, visc_map], axis=2)
        x = (x - self.mean) / self.std
        h = x.reshape(B * T, *x.shape[2:]).transpose(0, 2, 3, 1)  # channel-last
        for conv in self.enc_convs:
            h = jax.nn.relu(conv(h))
        g = self.enc_fc(h.reshape(B * T, -1))
        return self.enc_norm(g).reshape(B, T, -1)

    def decoder(self, g):
        B, T = g.shape[0], g.shape[1]
        h = self.dec_fc(g.reshape(B * T, -1)).reshape(B * T, 4, 8, -1)
        for i, conv in enumerate(self.dec_convs):
            h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]), "nearest")
            h = conv(h)
            if i < len(self.dec_convs) - 1:
                h = jax.nn.relu(h)
        out = h.transpose(0, 3, 1, 2).reshape(B, T, 3, h.shape[1], h.shape[2])
        return self.std[:, :, :3] * out + self.mean[:, :, :3]

    def koopman_operation(self, embed_data, k_matrix):
        return jnp.einsum("bte,fe->btf", embed_data, k_matrix)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        states = x[self.input_keys[0]]
        visc = x[self.input_keys[1]]
        k_matrix = self.get_koopman_matrix()
        embed = self.encoder(states, visc)
        recover = self.decoder(embed)
        pred = self.decoder(self.koopman_operation(embed, k_matrix))
        y = LorenzEmbedding.split_to_dict((pred[:, :-1], recover, k_matrix), self.output_keys)
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y
