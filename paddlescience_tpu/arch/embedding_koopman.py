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


class _KoopmanBandNet(Module):
    """1 -> 50 -> n MLP producing Koopman bands from viscosity (reference
    embedding_koopman.py:441-453)."""

    def __init__(self, out_features: int, *, rngs: Rngs):
        self.fc1 = Linear(1, 50, kernel_init=initializer.linear_init_, rngs=rngs)
        self.fc2 = Linear(50, out_features, kernel_init=initializer.linear_init_, rngs=rngs)

    def __call__(self, x):
        return self.fc2(jax.nn.relu(self.fc1(x)))


class CylinderEmbedding(base.Arch):
    """Koopman embedding for cylinder wake states at reference structure
    (reference embedding_koopman.py:274-545): replicate-padded conv
    encoder/decoder on a 64x128 grid, cylinder mask zeroing, and a
    **viscosity-conditioned** banded Koopman operator — diag and the 4
    upper/lower bands come from MLPs of 100*visc, giving a per-sample
    (E, E) matrix applied by batched matmul."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        mean: Optional[Tuple[float, ...]] = None,
        std: Optional[Tuple[float, ...]] = None,
        embed_size: int = 128,
        encoder_channels: Optional[Tuple[int, ...]] = None,
        decoder_channels: Optional[Tuple[int, ...]] = None,
        drop: float = 0.0,
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
        enc_ch = list(encoder_channels or (4, 16, 32, 64, 128))
        dec_ch = list(decoder_channels or (embed_size // 32, 128, 64, 32, 16))

        # cylinder mask on the (-2,14)x(-4,4) grid (reference :318-319)
        X, Y = np.meshgrid(np.linspace(-2, 14, 128), np.linspace(-4, 4, 64))
        self.mask = Buffer(jnp.asarray((np.sqrt(X**2 + Y**2) >= 1).astype(np.float32)))

        rp = dict(padding=1, padding_mode="replicate", rngs=rngs)
        self.enc_convs = [
            Conv(enc_ch[i - 1], enc_ch[i], (3, 3), strides=2, **rp)
            for i in range(1, len(enc_ch))
        ]
        # final conv to embed//32 channels at (4, 8) then LayerNorm over the
        # flattened (C, 4, 8) volume (reference :389-402)
        self.enc_out = Conv(enc_ch[-1], embed_size // 32, (3, 3), **rp)
        self.enc_norm = LayerNorm(embed_size)
        self.drop = drop

        self.dec_convs = [
            Conv(dec_ch[i - 1], dec_ch[i], (3, 3), **rp)
            for i in range(1, len(dec_ch))
        ]
        self.dec_out = Conv(dec_ch[-1], 3, (3, 3), **rp)

        # viscosity-conditioned Koopman bands: diag + 4 upper + 4 lower
        # (4E - 10 entries each side; reference :441-453,483-504)
        self.k_diag_net = _KoopmanBandNet(embed_size, rngs=rngs)
        self.k_ut_net = _KoopmanBandNet(4 * embed_size - 10, rngs=rngs)
        self.k_lt_net = _KoopmanBandNet(4 * embed_size - 10, rngs=rngs)
        xidx, yidx = [], []
        for i in range(1, 5):
            yidx.append(np.arange(i, embed_size))
            xidx.append(np.arange(0, embed_size - i))
        self._xidx = np.concatenate(xidx)
        self._yidx = np.concatenate(yidx)

        mean = [0.0, 0.0, 0.0, 0.0] if mean is None else list(mean)
        std = [1.0, 1.0, 1.0, 1.0] if std is None else list(std)
        self.mean = Buffer(jnp.asarray(mean, jnp.float32).reshape(1, 4, 1, 1))
        self.std = Buffer(jnp.asarray(std, jnp.float32).reshape(1, 4, 1, 1))

    def get_koopman_matrix(self, g, visc):
        """Per-sample banded operator from viscosity (reference :483-504)."""
        B = visc.shape[0]
        E = self.embed_size
        diag = self.k_diag_net(100.0 * visc)  # (B, E)
        ut = self.k_ut_net(100.0 * visc)  # (B, 4E-10)
        lt = self.k_lt_net(100.0 * visc)
        k = jnp.zeros((B, E, E))
        k = k.at[:, self._xidx, self._yidx].set(ut)
        k = k.at[:, self._yidx, self._xidx].set(lt)
        k = k.at[:, jnp.arange(E), jnp.arange(E)].set(diag)
        return k

    def encoder(self, x, visc):
        B, T, C, H, W = x.shape
        x = x.reshape(B * T, C, H, W)
        vmap_ = jnp.repeat(visc.reshape(B, 1), T, axis=1).reshape(B * T, 1, 1, 1)
        x = jnp.concatenate([x, vmap_ * jnp.ones_like(x[:, :1])], axis=1)
        x = (x - self.mean) / self.std
        h = x.transpose(0, 2, 3, 1)  # channel-last
        for conv in self.enc_convs:
            h = jax.nn.relu(conv(h))
        h = self.enc_out(h)  # (B*T, 4, 8, E//32)
        g = self.enc_norm(h.transpose(0, 3, 1, 2).reshape(B * T, -1))
        return g.reshape(B, T, -1)

    def decoder(self, g):
        B, T, _ = g.shape
        h = g.reshape(B * T, self.embed_size // 32, 4, 8).transpose(0, 2, 3, 1)
        for conv in self.dec_convs:
            h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]), "linear")
            h = jax.nn.relu(conv(h))
        h = self.dec_out(h).transpose(0, 3, 1, 2)  # (B*T, 3, 64, 128)
        h = self.std[:, :3] * h + self.mean[:, :3]
        h = h * self.mask[None, None]  # zero inside the cylinder (reference :472-478)
        return h.reshape(B, T, 3, h.shape[-2], h.shape[-1])

    def koopman_operation(self, embed_data, k_matrix):
        # (B, E, E) @ (B, T, E) per sample (reference bmm :506-510)
        return jnp.einsum("bef,btf->bte", k_matrix, embed_data)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        states = x[self.input_keys[0]]
        visc = x[self.input_keys[1]]
        embed = self.encoder(states, visc)
        recover = self.decoder(embed)
        k_matrix = self.get_koopman_matrix(embed, visc)
        pred = self.decoder(self.koopman_operation(embed, k_matrix))
        y = LorenzEmbedding.split_to_dict((pred[:, :-1], recover, k_matrix), self.output_keys)
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y
