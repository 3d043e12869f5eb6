"""CVit / CVit1D — Continuous Vision Transformer operator at reference
fidelity (reference ``ppsci/arch/cvit.py:35-1095``; arXiv:2405.13998
"Bridging Operator Learning and Conditioned Neural Fields").

Structure (matching the reference component-for-component):
  * sincos positional embeddings, trainable after init (reference :35-81)
  * ``PatchEmbed1D``/``PatchEmbed`` strided-conv patchifiers (:187-279)
  * ``Encoder1D`` (:322-370) / ``Encoder`` (:417-492) — the 3-D encoder adds
    separate time + space embeddings and a **TimeAggregation** perceiver
    (:373-414): learnable latents cross-attend over the time axis per
    spatial patch (num_latents=1, depth=2 as in the reference).
  * grid query embedding (:851-859, :1054-1062): query coords pick latent
    grid entries through an exp(-1e5 d^2) nearest-grid softmax.
  * perceiver-style decoder: ``CrossAttnBlock``s (:282-319) from query
    embeddings into the encoded function, then the residual+LayerNorm
    ``Mlp`` head (:136-184).

All attention is plain jnp einsum (MXU); convs run channel-last.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, LayerNorm, Linear
from paddlescience_tpu.utils import initializer

__all__ = ["CVit1D", "CVit"]


# ------------------------------------------------- sincos embeddings (:35-81) --


def _sincos_1d(embed_dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = jnp.einsum("m,d->md", pos.reshape(-1), omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)  # (M, D)


def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> jnp.ndarray:
    return _sincos_1d(embed_dim, jnp.arange(length, dtype=jnp.float32))[None]


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> jnp.ndarray:
    gh = jnp.arange(grid_size[0], dtype=jnp.float32)
    gw = jnp.arange(grid_size[1], dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(gw, gh, indexing="ij"), axis=0)  # w first (:75)
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    return jnp.concatenate([emb_h, emb_w], axis=1)[None]  # (1, H*W, D)


# ------------------------------------------------------------------- blocks --


class _MHA(Module):
    """MultiHeadDotProductAttention (reference :592-689): separate q/k/v/out
    projections with bias, scaled dot-product."""

    def __init__(self, dim, num_heads, kv_dim=None, *, rngs: Rngs):
        kv_dim = kv_dim or dim
        self.q = Linear(dim, dim, rngs=rngs)
        self.k = Linear(kv_dim, dim, rngs=rngs)
        self.v = Linear(kv_dim, dim, rngs=rngs)
        self.o = Linear(dim, dim, rngs=rngs)
        self.h = num_heads

    def __call__(self, q_in, kv_in):
        *batch, T, E = q_in.shape
        S = kv_in.shape[-2]
        H = self.h
        q = self.q(q_in).reshape(*batch, T, H, E // H)
        k = self.k(kv_in).reshape(*batch, S, H, E // H)
        v = self.v(kv_in).reshape(*batch, S, H, E // H)
        att = jax.nn.softmax(
            jnp.einsum("...thd,...shd->...hts", q, k) / math.sqrt(E // H), axis=-1)
        return self.o(jnp.einsum("...hts,...shd->...thd", att, v).reshape(*batch, T, E))


class _MlpBlock(Module):
    """Two-layer gelu MLP (reference MlpBlock :84-106)."""

    def __init__(self, in_dim, hidden, out_dim, *, rngs: Rngs):
        self.fc1 = Linear(in_dim, hidden, rngs=rngs)
        self.fc2 = Linear(hidden, out_dim, rngs=rngs)

    def __call__(self, x):
        return self.fc2(jax.nn.gelu(self.fc1(x)))


class _SelfAttnBlock(Module):
    """Pre-norm self-attention block (reference :109-133)."""

    def __init__(self, num_heads, emb_dim, mlp_ratio, eps, *, rngs: Rngs):
        self.ln1 = LayerNorm(emb_dim, epsilon=eps)
        self.attn = _MHA(emb_dim, num_heads, rngs=rngs)
        self.ln2 = LayerNorm(emb_dim, epsilon=eps)
        self.mlp = _MlpBlock(emb_dim, emb_dim * mlp_ratio, emb_dim, rngs=rngs)

    def __call__(self, x):
        h = self.ln1(x)
        x = x + self.attn(h, h)
        return x + self.mlp(self.ln2(x))


class _CrossAttnBlock(Module):
    """Pre-norm cross-attention block (reference :282-319)."""

    def __init__(self, num_heads, emb_dim, mlp_ratio, eps, *, rngs: Rngs):
        self.ln_q = LayerNorm(emb_dim, epsilon=eps)
        self.ln_kv = LayerNorm(emb_dim, epsilon=eps)
        self.attn = _MHA(emb_dim, num_heads, rngs=rngs)
        self.ln_y = LayerNorm(emb_dim, epsilon=eps)
        self.mlp = _MlpBlock(emb_dim, emb_dim * mlp_ratio, emb_dim, rngs=rngs)

    def __call__(self, q_inputs, kv_inputs):
        x = self.attn(self.ln_q(q_inputs), self.ln_kv(kv_inputs)) + q_inputs
        return x + self.mlp(self.ln_y(x))


class _Mlp(Module):
    """Residual + LayerNorm MLP head (reference Mlp :136-184):
    x <- norm(x + gelu(linear(x))) per layer, then linear out."""

    def __init__(self, num_layers, hidden_dim, out_dim, eps, *, rngs: Rngs):
        self.linears = [Linear(hidden_dim, hidden_dim, rngs=rngs) for _ in range(num_layers)]
        self.norms = [LayerNorm(hidden_dim, epsilon=eps) for _ in range(num_layers)]
        self.out = Linear(hidden_dim, out_dim, rngs=rngs)

    def __call__(self, x):
        for lin, norm in zip(self.linears, self.norms):
            x = norm(x + jax.nn.gelu(lin(x)))
        return self.out(x)


class TimeAggregation(Module):
    """Perceiver time-reducer (reference :373-414): ``num_latents`` learnable
    latents cross-attend over the time axis independently per spatial patch.
    (B, T, S, D) -> (B, num_latents, S, D)."""

    def __init__(self, emb_dim, depth, num_heads=8, num_latents=64, mlp_ratio=1, eps=1e-5, *, rngs: Rngs):
        self.latents = Param(initializer.normal_(0.0, 1e-2)(rngs.params(), (num_latents, emb_dim)))
        self.blocks = [_CrossAttnBlock(num_heads, emb_dim, mlp_ratio, eps, rngs=rngs) for _ in range(depth)]

    def __call__(self, x):
        B, T, S, D = x.shape
        latents = jnp.broadcast_to(self.latents[None, None], (B, S) + self.latents.shape)
        x = x.transpose(0, 2, 1, 3)  # (B, S, T, D)
        for blk in self.blocks:
            latents = blk(latents, x)  # batch dims (B, S)
        return latents.transpose(0, 2, 1, 3)  # (B, T', S, D)


class Encoder1D(Module):
    """Patchify + sincos pos + self-attention stack (reference :322-370)."""

    def __init__(self, in_dim, spatial_dims, patch_size, emb_dim, depth, num_heads, mlp_ratio, eps, *, rngs: Rngs):
        self.patch_conv = Conv(in_dim, emb_dim, (patch_size[0],), strides=patch_size[0], padding="VALID", rngs=rngs)
        n_patches = spatial_dims // patch_size[0]
        self.pos_emb = Param(get_1d_sincos_pos_embed(emb_dim, n_patches))  # trainable after init (:356-361)
        self.blocks = [_SelfAttnBlock(num_heads, emb_dim, mlp_ratio, eps, rngs=rngs) for _ in range(depth)]

    def __call__(self, x):
        x = self.patch_conv(x) + self.pos_emb
        for blk in self.blocks:
            x = blk(x)
        return x


class Encoder(Module):
    """3-D patchify + separate time/space sincos embeddings + TimeAggregation
    + self-attention stack (reference :417-492)."""

    def __init__(self, in_dim, spatial_dims, patch_size, emb_dim, depth, num_heads, mlp_ratio, eps, *, rngs: Rngs):
        t, h, w = spatial_dims
        self.num_patches = (t // patch_size[0], h // patch_size[1], w // patch_size[2])
        self.patch_conv = Conv(in_dim, emb_dim, tuple(patch_size), strides=tuple(patch_size), padding="VALID", rngs=rngs)
        self.time_agg = TimeAggregation(emb_dim, depth=2, num_heads=num_heads,
                                        num_latents=1, mlp_ratio=mlp_ratio, eps=eps, rngs=rngs)
        self.norm = LayerNorm(emb_dim, epsilon=eps)
        self.time_emb = Param(get_1d_sincos_pos_embed(emb_dim, self.num_patches[0]))
        self.pos_emb = Param(get_2d_sincos_pos_embed(emb_dim, (self.num_patches[1], self.num_patches[2])))
        self.blocks = [_SelfAttnBlock(num_heads, emb_dim, mlp_ratio, eps, rngs=rngs) for _ in range(depth)]

    def __call__(self, x):
        b = x.shape[0]
        x = self.patch_conv(x)  # (B, T', H', W', D)
        tp, hp, wp = self.num_patches
        x = x.reshape(b, tp, hp * wp, -1)  # (B, T', S, D)
        x = x + self.time_emb[:, :, None] + self.pos_emb[:, None]
        x = self.time_agg(x)  # (B, 1, S, D)
        x = self.norm(x)
        x = x.reshape(b, -1, x.shape[-1])  # (B, T'*S, D)
        for blk in self.blocks:
            x = blk(x)
        return x


# ------------------------------------------------------------------- models --


class _GridQueryEmbed(Module):
    """Nearest-grid softmax latent lookup for query coordinates
    (reference :851-856 / :1054-1059)."""

    def __init__(self, grid, latent_dim, dec_emb_dim, eps, *, rngs: Rngs):
        self.grid = grid  # (G,) or (G, 2), static
        self.latents = Param(initializer.normal_(0.0, 1e-2)(rngs.params(), (grid.shape[0], latent_dim)))
        self.fc = Linear(latent_dim, dec_emb_dim, rngs=rngs)
        self.norm = LayerNorm(dec_emb_dim, epsilon=eps)

    def __call__(self, coords):
        if self.grid.ndim == 1:
            d2 = (coords - self.grid[None, :]) ** 2  # (P, G)
        else:
            d2 = jnp.sum((coords[:, None, :] - self.grid[None]) ** 2, axis=-1)
        w = jax.nn.softmax(-1e5 * d2, axis=1)  # == exp(-1e5 d2)/sum (:853)
        return self.norm(self.fc(jnp.einsum("ic,pi->pc", self.latents, w)))


class _MlpQueryEmbed(Module):
    """MLP query embedding (reference embedding_type="mlp", :810-812; the
    reference wires MlpBlock(latent_dim, ...) but feeds coords_dim-wide
    coordinates — here the input width is coords_dim, which is what actually
    runs)."""

    def __init__(self, coords_dim, dec_emb_dim, eps, *, rngs: Rngs):
        self.mlp = _MlpBlock(coords_dim, dec_emb_dim, dec_emb_dim, rngs=rngs)
        self.norm = LayerNorm(dec_emb_dim, epsilon=eps)

    def __call__(self, coords):
        return self.norm(self.mlp(coords))


class _CVitBase(base.Arch):
    """Shared decoder/head assembly for CVit1D and CVit."""

    def _build_decoder(self, emb_dim, dec_emb_dim, dec_num_heads, dec_depth,
                       num_mlp_layers, mlp_ratio, out_dim, eps, rngs):
        self.enc_norm = LayerNorm(emb_dim, epsilon=eps)
        self.fc1 = Linear(emb_dim, dec_emb_dim, rngs=rngs)
        self.cross_blocks = [
            _CrossAttnBlock(dec_num_heads, dec_emb_dim, mlp_ratio, eps, rngs=rngs)
            for _ in range(dec_depth)
        ]
        self.block_norm = LayerNorm(dec_emb_dim, epsilon=eps)
        self.final_mlp = _Mlp(num_mlp_layers, dec_emb_dim, out_dim, eps, rngs=rngs)

    def _decode(self, enc, cemb, b):
        x = self.fc1(self.enc_norm(enc))
        q = jnp.broadcast_to(cemb[None], (b,) + cemb.shape)
        for blk in self.cross_blocks:
            q = blk(q, x)
        return self.final_mlp(self.block_norm(q))

    def __call__(self, x_dict: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x_dict = self._input_transform(x_dict)
        x, coords = x_dict[self.input_keys[0]], x_dict[self.input_keys[1]]
        if coords.ndim >= 3:
            coords = coords[0]  # (B, N, C) -> (N, C) (reference :883-884)
        y = self.forward_tensor(x, coords)
        y_dict = {self.output_keys[0]: y}
        if self._output_transform is not None:
            y_dict = self._output_transform(x_dict, y_dict)
        return y_dict


class CVit1D(_CVitBase):
    """1-D continuous ViT operator (reference cvit.py:692-892)."""

    def __init__(
        self,
        input_keys: Sequence[str],
        output_keys: Sequence[str],
        spatial_dims: int,
        in_dim: int,
        coords_dim: int,
        patch_size: Sequence[int] = (4,),
        grid_size: Sequence[int] = (200,),
        latent_dim: int = 256,
        emb_dim: int = 256,
        depth: int = 3,
        num_heads: int = 8,
        dec_emb_dim: int = 256,
        dec_num_heads: int = 8,
        dec_depth: int = 1,
        num_mlp_layers: int = 1,
        mlp_ratio: int = 1,
        out_dim: int = 1,
        layer_norm_eps: float = 1e-5,
        embedding_type: str = "grid",
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.embedding_type = embedding_type
        eps = layer_norm_eps
        if embedding_type == "grid":
            self.query_embed = _GridQueryEmbed(jnp.linspace(0, 1, grid_size[0]),
                                               latent_dim, dec_emb_dim, eps, rngs=rngs)
        else:
            self.query_embed = _MlpQueryEmbed(coords_dim, dec_emb_dim, eps, rngs=rngs)
        self.encoder = Encoder1D(in_dim, spatial_dims, patch_size, emb_dim, depth,
                                 num_heads, mlp_ratio, eps, rngs=rngs)
        self._build_decoder(emb_dim, dec_emb_dim, dec_num_heads, dec_depth,
                            num_mlp_layers, mlp_ratio, out_dim, eps, rngs)

    def forward_tensor(self, x, coords):
        cemb = self.query_embed(coords)
        enc = self.encoder(x)
        return self._decode(enc, cemb, x.shape[0])


class CVit(_CVitBase):
    """(T, H, W) continuous ViT operator (reference cvit.py:895-1095): 3-D
    patch embedding, separate time/space sincos embeddings, TimeAggregation
    perceiver, self-attention encoder, grid-latent query embedding,
    cross-attention decoder."""

    def __init__(
        self,
        input_keys: Sequence[str],
        output_keys: Sequence[str],
        in_dim: int,
        coords_dim: int,
        spatial_dims: Sequence[int],
        patch_size: Sequence[int] = (1, 16, 16),
        grid_size: Sequence[int] = (128, 128),
        latent_dim: int = 256,
        emb_dim: int = 256,
        depth: int = 3,
        num_heads: int = 8,
        dec_emb_dim: int = 256,
        dec_num_heads: int = 8,
        dec_depth: int = 1,
        num_mlp_layers: int = 1,
        mlp_ratio: int = 1,
        out_dim: int = 1,
        layer_norm_eps: float = 1e-5,
        embedding_type: str = "grid",
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.embedding_type = embedding_type
        eps = layer_norm_eps
        if len(spatial_dims) == 2:
            # plain 2-D inputs: treat as a single-frame volume
            spatial_dims = (1, *spatial_dims)
            patch_size = (1, *patch_size) if len(patch_size) == 2 else patch_size
        if embedding_type == "grid":
            gh, gw = grid_size
            gx, gy = jnp.meshgrid(jnp.linspace(0, 1, gh), jnp.linspace(0, 1, gw), indexing="ij")
            grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (gh*gw, 2) (:1002-1006)
            self.query_embed = _GridQueryEmbed(grid, latent_dim, dec_emb_dim, eps, rngs=rngs)
        else:
            self.query_embed = _MlpQueryEmbed(coords_dim, dec_emb_dim, eps, rngs=rngs)
        self.encoder = Encoder(in_dim, spatial_dims, patch_size, emb_dim, depth,
                               num_heads, mlp_ratio, eps, rngs=rngs)
        self._build_decoder(emb_dim, dec_emb_dim, dec_num_heads, dec_depth,
                            num_mlp_layers, mlp_ratio, out_dim, eps, rngs)

    def forward_tensor(self, x, coords):
        if x.ndim == 4:  # (B, H, W, C) -> single-frame volume
            x = x[:, None]
        cemb = self.query_embed(coords)
        enc = self.encoder(x)
        return self._decode(enc, cemb, x.shape[0])
