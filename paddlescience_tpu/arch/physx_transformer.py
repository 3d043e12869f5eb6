"""PhysformerGPT2 — transformer decoder for physics surrogates
(reference ``ppsci/arch/physx_transformer.py:241``; transformers-for-physx).

GPT2-style causal self-attention over Koopman-embedded state sequences with
sinusoidal position embeddings. Attention is plain jnp (QK^T softmax V) —
XLA maps the batched matmuls onto the MXU; causal masking is a static
triangular mask (no dynamic shapes).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import LayerNorm, Linear
from paddlescience_tpu.utils import initializer

__all__ = ["PhysformerGPT2"]


class _Block(Module):
    """Pre-LN transformer block with causal masked attention
    (reference physx_transformer.py:187)."""

    def __init__(self, num_ctx: int, embed_size: int, num_heads: int, initializer_range: float, *, rngs: Rngs):
        init = initializer.normal_(0.0, initializer_range)
        self.ln1 = LayerNorm(embed_size)
        self.qkv = Linear(embed_size, 3 * embed_size, kernel_init=init, rngs=rngs)
        self.proj = Linear(embed_size, embed_size, kernel_init=init, rngs=rngs)
        self.ln2 = LayerNorm(embed_size)
        self.fc1 = Linear(embed_size, 4 * embed_size, kernel_init=init, rngs=rngs)
        self.fc2 = Linear(4 * embed_size, embed_size, kernel_init=init, rngs=rngs)
        self.num_heads = num_heads
        self.embed_size = embed_size

    def _attn(self, x):
        B, T, E = x.shape
        H = self.num_heads
        qkv = self.qkv(x).reshape(B, T, 3, H, E // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, H, D)
        att = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(E // H)
        causal = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(causal[None, None], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, E)
        return self.proj(out)

    def __call__(self, x):
        x = x + self._attn(self.ln1(x))
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.ln2(x))))
        return x


class PhysformerGPT2(base.Arch):
    """Transformer decoder over embedded physics states."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        num_layers: int,
        num_ctx: int,
        embed_size: int,
        num_heads: int,
        embd_pdrop: float = 0.0,
        attn_pdrop: float = 0.0,
        resid_pdrop: float = 0.0,
        initializer_range: float = 0.05,
        embedding_model: Optional[base.Arch] = None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.num_layers = num_layers
        self.num_ctx = num_ctx
        self.embed_size = embed_size
        self.num_heads = num_heads
        self.blocks = [
            _Block(num_ctx, embed_size, num_heads, initializer_range, rngs=rngs) for _ in range(num_layers)
        ]
        self.ln = LayerNorm(embed_size)
        self.linear = Linear(embed_size, embed_size, kernel_init=initializer.normal_(0.0, initializer_range), rngs=rngs)
        self.embedding_model = embedding_model
        self.training = True

    def get_position_embed(self, x):
        """Sinusoidal position embedding (reference physx_transformer.py:330)."""
        B, N, E = x.shape
        position = jnp.arange(N, dtype=jnp.float32)[:, None]  # (N, 1)
        i = jnp.arange(E // 2, dtype=jnp.float32)[None, :]
        angle = position / jnp.power(10000.0, 2 * i / E)
        pe = jnp.zeros((N, E))
        pe = pe.at[:, 0::2].set(jnp.sin(angle))
        pe = pe.at[:, 1::2].set(jnp.cos(angle))
        return jnp.broadcast_to(pe[None], (B, N, E))

    def forward_tensor(self, x):
        h = x + self.get_position_embed(x)
        for block in self.blocks:
            h = block(h)
        return (self.linear(self.ln(h)),)

    def generate(self, input_embeds, max_length: int = None):
        """Autoregressive rollout: feed back the last prediction
        (reference physx_transformer.py:generate/_generate_time_series)."""
        max_length = max_length or self.num_ctx
        seq = input_embeds
        for _ in range(max_length - 1):
            ctx = seq[:, -self.num_ctx :]
            pred = self.forward_tensor(ctx)[0]
            seq = jnp.concatenate([seq, pred[:, -1:]], axis=1)
        return seq

    def forward_eval(self, x):
        outputs = self.generate(x[:, :1], max_length=x.shape[1] + 1)
        return (outputs[:, 1:],)

    @staticmethod
    def split_to_dict(data_tensors, keys):
        return {key: data_tensors[i] for i, key in enumerate(keys)}

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        x_tensor = self.concat_to_tensor(x, self.input_keys, axis=-1)
        if self.embedding_model is not None:
            from paddlescience_tpu.arch.embedding_koopman import CylinderEmbedding

            if isinstance(self.embedding_model, CylinderEmbedding):
                x_tensor = self.embedding_model.encoder(x_tensor, x["visc"])
            else:
                x_tensor = self.embedding_model.encoder(x_tensor)
        y = self.forward_tensor(x_tensor) if self.training else self.forward_eval(x_tensor)
        if self.embedding_model is not None:
            y = tuple(self.embedding_model.decoder(t) for t in y)
        y = self.split_to_dict(y, self.output_keys)
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y
