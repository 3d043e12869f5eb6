"""CVit / CVit1D — Continuous Vision Transformer operator
(reference ``ppsci/arch/cvit.py:692,895``; arXiv:2405.13998).

Patch-embedded function samples go through a self-attention encoder; query
coordinates get grid-softmax latent embeddings and cross-attend to the
encoded function. All attention is plain jnp einsum (MXU).
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


class _MHA(Module):
    def __init__(self, dim, num_heads, kv_dim=None, *, rngs: Rngs):
        kv_dim = kv_dim or dim
        self.q = Linear(dim, dim, rngs=rngs)
        self.k = Linear(kv_dim, dim, rngs=rngs)
        self.v = Linear(kv_dim, dim, rngs=rngs)
        self.o = Linear(dim, dim, rngs=rngs)
        self.h = num_heads

    def __call__(self, q_in, kv_in):
        B, T, E = q_in.shape
        S = kv_in.shape[1]
        H = self.h
        q = self.q(q_in).reshape(B, T, H, E // H)
        k = self.k(kv_in).reshape(B, S, H, E // H)
        v = self.v(kv_in).reshape(B, S, H, E // H)
        att = jax.nn.softmax(jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(E // H), axis=-1)
        return self.o(jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, E))


class _Block(Module):
    def __init__(self, dim, num_heads, mlp_ratio, eps, cross=False, kv_dim=None, *, rngs: Rngs):
        self.ln1 = LayerNorm(dim, epsilon=eps)
        self.attn = _MHA(dim, num_heads, kv_dim, rngs=rngs)
        self.ln2 = LayerNorm(dim, epsilon=eps)
        self.fc1 = Linear(dim, dim * mlp_ratio, rngs=rngs)
        self.fc2 = Linear(dim * mlp_ratio, dim, rngs=rngs)
        self.cross = cross
        if cross:
            self.ln_kv = LayerNorm(kv_dim or dim, epsilon=eps)

    def __call__(self, x, context=None):
        if self.cross:
            x = x + self.attn(self.ln1(x), self.ln_kv(context))
        else:
            h = self.ln1(x)
            x = x + self.attn(h, h)
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.ln2(x))))
        return x


class CVit1D(base.Arch):
    """1-D continuous ViT operator (reference cvit.py:692)."""

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
            n_x = grid_size[0]
            self.grid = jnp.linspace(0, 1, n_x)
            self.latents = Param(initializer.normal_(0.0, 1e-2)(rngs.params(), (n_x, latent_dim)))
            self.coord_fc = Linear(latent_dim, dec_emb_dim, rngs=rngs)
        else:
            self.coord_fc1 = Linear(coords_dim, dec_emb_dim, rngs=rngs)
            self.coord_fc2 = Linear(dec_emb_dim, dec_emb_dim, rngs=rngs)
        self.coord_norm = LayerNorm(dec_emb_dim, epsilon=eps)

        # encoder: 1D patch embed (conv stride patch) + positional embedding
        self.patch_conv = Conv(in_dim, emb_dim, (patch_size[0],), strides=patch_size[0], padding="VALID", rngs=rngs)
        n_patches = spatial_dims // patch_size[0]
        self.pos_emb = Param(initializer.normal_(0.0, 0.02)(rngs.params(), (1, n_patches, emb_dim)))
        self.enc_blocks = [_Block(emb_dim, num_heads, mlp_ratio, eps, rngs=rngs) for _ in range(depth)]
        self.enc_norm = LayerNorm(emb_dim, epsilon=eps)
        self.fc1 = Linear(emb_dim, dec_emb_dim, rngs=rngs)

        self.cross_blocks = [
            _Block(dec_emb_dim, dec_num_heads, mlp_ratio, eps, cross=True, kv_dim=dec_emb_dim, rngs=rngs)
            for _ in range(dec_depth)
        ]
        self.block_norm = LayerNorm(dec_emb_dim, epsilon=eps)
        mlps = []
        for _ in range(num_mlp_layers):
            mlps.append(Linear(dec_emb_dim, dec_emb_dim, rngs=rngs))
        self.final_hidden = mlps
        self.final_out = Linear(dec_emb_dim, out_dim, rngs=rngs)

    def forward_tensor(self, x, coords):
        b = x.shape[0]
        if self.embedding_type == "grid":
            d2 = (coords - self.grid[None, :]) ** 2  # (n_pts, n_x)
            w = jax.nn.softmax(-1e5 * d2, axis=1)
            cemb = jnp.einsum("ic,pi->pc", self.latents, w)
            cemb = self.coord_norm(self.coord_fc(cemb))
        else:
            cemb = self.coord_norm(self.coord_fc2(jax.nn.gelu(self.coord_fc1(coords))))
        cemb = jnp.broadcast_to(cemb[None], (b,) + cemb.shape)

        h = self.patch_conv(x) + self.pos_emb
        for blk in self.enc_blocks:
            h = blk(h)
        h = self.fc1(self.enc_norm(h))

        q = cemb
        for blk in self.cross_blocks:
            q = blk(q, context=h)
        q = self.block_norm(q)
        for lin in self.final_hidden:
            q = jax.nn.gelu(lin(q))
        return self.final_out(q)

    def __call__(self, x_dict: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x_dict = self._input_transform(x_dict)
        x, coords = x_dict[self.input_keys[0]], x_dict[self.input_keys[1]]
        if coords.ndim >= 3:
            coords = coords[0]
        y = self.forward_tensor(x, coords)
        y_dict = {self.output_keys[0]: y}
        if self._output_transform is not None:
            y_dict = self._output_transform(x_dict, y_dict)
        return y_dict


class CVit(base.Arch):
    """2-D CVit (reference cvit.py:895): patch-embed (B, H, W, C) inputs with
    optional time aggregation, grid latent query embedding."""

    def __init__(
        self,
        input_keys: Sequence[str],
        output_keys: Sequence[str],
        spatial_dims: Sequence[int],
        in_dim: int,
        coords_dim: int,
        patch_size: Sequence[int] = (8, 8),
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
        eps = layer_norm_eps
        gh, gw = grid_size
        # 2D grid latents
        gx, gy = jnp.meshgrid(jnp.linspace(0, 1, gh), jnp.linspace(0, 1, gw), indexing="ij")
        self.grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (gh*gw, 2)
        self.latents = Param(initializer.normal_(0.0, 1e-2)(rngs.params(), (gh * gw, latent_dim)))
        self.coord_fc = Linear(latent_dim, dec_emb_dim, rngs=rngs)
        self.coord_norm = LayerNorm(dec_emb_dim, epsilon=eps)

        self.patch_conv = Conv(in_dim, emb_dim, tuple(patch_size), strides=tuple(patch_size), padding="VALID", rngs=rngs)
        # spatio-temporal patching: spatial_dims may be (H, W) or (T, H, W)
        # (reference ns_cvit: patch_size (1, 8, 8) over (T, H, W, C) frames)
        n_patches = 1
        for d, p in zip(spatial_dims, patch_size):
            n_patches *= d // p
        self.pos_emb = Param(initializer.normal_(0.0, 0.02)(rngs.params(), (1, n_patches, emb_dim)))
        self.enc_blocks = [_Block(emb_dim, num_heads, mlp_ratio, eps, rngs=rngs) for _ in range(depth)]
        self.enc_norm = LayerNorm(emb_dim, epsilon=eps)
        self.fc1 = Linear(emb_dim, dec_emb_dim, rngs=rngs)
        self.cross_blocks = [
            _Block(dec_emb_dim, dec_num_heads, mlp_ratio, eps, cross=True, kv_dim=dec_emb_dim, rngs=rngs)
            for _ in range(dec_depth)
        ]
        self.block_norm = LayerNorm(dec_emb_dim, epsilon=eps)
        self.final_hidden = [Linear(dec_emb_dim, dec_emb_dim, rngs=rngs) for _ in range(num_mlp_layers)]
        self.final_out = Linear(dec_emb_dim, out_dim, rngs=rngs)

    def __call__(self, x_dict: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        x, coords = x_dict[self.input_keys[0]], x_dict[self.input_keys[1]]
        if coords.ndim >= 3:
            coords = coords[0]
        b = x.shape[0]
        d2 = jnp.sum((coords[:, None, :] - self.grid[None, :, :]) ** 2, axis=-1)
        w = jax.nn.softmax(-1e5 * d2, axis=1)
        cemb = self.coord_norm(self.coord_fc(jnp.einsum("ic,pi->pc", self.latents, w)))
        cemb = jnp.broadcast_to(cemb[None], (b,) + cemb.shape)

        h = self.patch_conv(x)
        h = h.reshape(b, -1, h.shape[-1]) + self.pos_emb
        for blk in self.enc_blocks:
            h = blk(h)
        h = self.fc1(self.enc_norm(h))
        q = cemb
        for blk in self.cross_blocks:
            q = blk(q, context=h)
        q = self.block_norm(q)
        for lin in self.final_hidden:
            q = jax.nn.gelu(lin(q))
        return {self.output_keys[0]: self.final_out(q)}
