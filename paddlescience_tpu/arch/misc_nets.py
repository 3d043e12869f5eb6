"""Smaller nets: Epnn, USCNN, HEDeepONets, ChipDeepONets, Transformer for
symbolic regression.

References:
  * Epnn            (ppsci/arch/epnn.py:78) — elasto-plastic constitutive net
  * USCNN           (ppsci/arch/uscnn.py:57) — upsampled CNN on structured grids
  * HEDeepONets     (ppsci/arch/he_deeponets.py:28) — heat-exchanger multi-branch
  * ChipDeepONets   (ppsci/arch/chip_deeponets.py:28) — chip thermal multi-branch
  * Transformer     (ppsci/arch/transformer.py) — encoder/decoder seq2seq
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import activation as act_mod
from paddlescience_tpu.arch import base, mlp
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, Embedding, LayerNorm, Linear

__all__ = ["Epnn", "USCNN", "HEDeepONets", "ChipDeepONets", "Transformer"]


class Epnn(base.Arch):
    """Elasto-plastic constitutive network (reference epnn.py:78)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        node_sizes: Tuple[int, ...],
        activations: Tuple[str, ...],
        drop_p: float = 0.0,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.acts = [act_mod.get_activation(a) if not isinstance(act_mod.get_activation(a), type) else act_mod.get_activation(a)() for a in activations]
        layers = [Linear(node_sizes[0], node_sizes[1], rngs=rngs)]
        for h1, h2 in zip(node_sizes[1:-2], node_sizes[2:-1]):
            layers.append(Linear(h1, h2, rngs=rngs))
        layers.append(Linear(node_sizes[-2], node_sizes[-1], bias=False, rngs=rngs))
        self.layers = layers
        self.drop_p = drop_p

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        y = self.concat_to_tensor(x, self.input_keys, axis=-1)
        for i, layer in enumerate(self.layers):
            y = layer(y)
            if i < len(self.acts):
                y = self.acts[i](y)
        return self.split_to_dict(y, self.output_keys, axis=-1)


class USCNN(base.Arch):
    """Upsampled structured-grid CNN (reference uscnn.py:57): bilinear
    upsample then conv stack. I/O channel-first (B, C, H, W)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        hidden_size: Union[int, Tuple[int, ...]],
        h: float,
        nx: int,
        ny: int,
        nvar_in: int = 1,
        nvar_out: int = 1,
        pad_singleside: int = 1,
        k: int = 5,
        s: int = 1,
        p: int = 2,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.nx, self.ny = nx, ny
        self.pad_singleside = pad_singleside
        sizes = [hidden_size] * 3 if isinstance(hidden_size, int) else list(hidden_size)
        convs = []
        c_in = nvar_in
        for c in sizes:
            convs.append(Conv(c_in, c, (k, k), strides=s, padding=p, rngs=rngs))
            c_in = c
        convs.append(Conv(c_in, nvar_out, (k, k), strides=s, padding=p, rngs=rngs))
        self.convs = convs

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        h = x[self.input_keys[0]].transpose(0, 2, 3, 1)
        h = jax.image.resize(h, (h.shape[0], self.ny, self.nx, h.shape[3]), "bilinear")
        for i, conv in enumerate(self.convs):
            h = conv(h)
            if i < len(self.convs) - 1:
                h = jax.nn.relu(h)
        return {self.output_keys[0]: h.transpose(0, 3, 1, 2)}


class HEDeepONets(base.Arch):
    """Heat-exchanger DeepONet: hot/cold boundary branch nets + trunk net,
    three output temperatures (reference he_deeponets.py:28)."""

    def __init__(
        self,
        heat_input_keys: Tuple[str, ...],
        cold_input_keys: Tuple[str, ...],
        trunk_input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        heat_num_loc: int,
        cold_num_loc: int,
        num_features: int,
        branch_num_layers: int,
        trunk_num_layers: int,
        branch_hidden_size: Union[int, Tuple[int, ...]],
        trunk_hidden_size: Union[int, Tuple[int, ...]],
        branch_activation: str = "tanh",
        trunk_activation: str = "tanh",
        use_bias: bool = True,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.heat_input_keys = tuple(heat_input_keys)
        self.cold_input_keys = tuple(cold_input_keys)
        self.trunk_input_keys = tuple(trunk_input_keys)
        self.input_keys = self.heat_input_keys + self.cold_input_keys + self.trunk_input_keys
        self.output_keys = tuple(output_keys)
        self.num_features = num_features

        self.heat_net = mlp.MLP(
            self.heat_input_keys, ("b",), branch_num_layers, branch_hidden_size, branch_activation,
            input_dim=heat_num_loc, output_dim=num_features * len(output_keys), rngs=rngs,
        )
        self.cold_net = mlp.MLP(
            self.cold_input_keys, ("b",), branch_num_layers, branch_hidden_size, branch_activation,
            input_dim=cold_num_loc, output_dim=num_features * len(output_keys), rngs=rngs,
        )
        self.trunk_net = mlp.MLP(
            self.trunk_input_keys, ("t",), trunk_num_layers, trunk_hidden_size, trunk_activation,
            input_dim=len(trunk_input_keys), output_dim=num_features * len(output_keys), rngs=rngs,
        )
        self.use_bias = use_bias
        if use_bias:
            self.b = Param(jnp.zeros((len(output_keys),)))

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        heat = self.heat_net({k: x[k] for k in self.heat_input_keys})["b"]
        cold = self.cold_net({k: x[k] for k in self.cold_input_keys})["b"]
        trunk = self.trunk_net({k: x[k] for k in self.trunk_input_keys})["t"]
        result = {}
        nf = self.num_features
        for i, key in enumerate(self.output_keys):
            st, ed = i * nf, (i + 1) * nf
            out = jnp.sum(heat[:, st:ed] * cold[:, st:ed] * trunk[:, st:ed], axis=-1, keepdims=True)
            if self.use_bias:
                out = out + self.b[i]
            result[key] = out
        return result


class ChipDeepONets(base.Arch):
    """Chip-thermal DeepONet: boundary + power-map branch nets + trunk
    (reference chip_deeponets.py:28)."""

    def __init__(
        self,
        branch_input_keys: Tuple[str, ...],
        BCtype_input_keys: Tuple[str, ...],
        BC_input_keys: Tuple[str, ...],
        trunk_input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        num_loc: int,
        bctype_loc: int,
        BC_num_loc: int,
        num_features: int,
        branch_num_layers: int,
        BC_num_layers: int,
        trunk_num_layers: int,
        branch_hidden_size: Union[int, Tuple[int, ...]],
        BC_hidden_size: Union[int, Tuple[int, ...]],
        trunk_hidden_size: Union[int, Tuple[int, ...]],
        branch_activation: str = "swish",
        BC_activation: str = "swish",
        trunk_activation: str = "swish",
        use_bias: bool = True,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.branch_input_keys = tuple(branch_input_keys)
        self.BCtype_input_keys = tuple(BCtype_input_keys)
        self.BC_input_keys = tuple(BC_input_keys)
        self.trunk_input_keys = tuple(trunk_input_keys)
        self.input_keys = (
            self.branch_input_keys + self.BCtype_input_keys + self.BC_input_keys + self.trunk_input_keys
        )
        self.output_keys = tuple(output_keys)

        self.branch_net = mlp.MLP(
            self.branch_input_keys, ("b",), branch_num_layers, branch_hidden_size, branch_activation,
            input_dim=num_loc, output_dim=num_features, rngs=rngs,
        )
        self.BCtype_net = mlp.MLP(
            self.BCtype_input_keys, ("b",), BC_num_layers, BC_hidden_size, BC_activation,
            input_dim=bctype_loc, output_dim=num_features, rngs=rngs,
        )
        self.BC_net = mlp.MLP(
            self.BC_input_keys, ("b",), BC_num_layers, BC_hidden_size, BC_activation,
            input_dim=BC_num_loc, output_dim=num_features, rngs=rngs,
        )
        self.trunk_net = mlp.MLP(
            self.trunk_input_keys, ("t",), trunk_num_layers, trunk_hidden_size, trunk_activation,
            input_dim=len(trunk_input_keys), output_dim=num_features, rngs=rngs,
        )
        self.use_bias = use_bias
        if use_bias:
            self.b = Param(jnp.zeros((1,)))

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        b = self.branch_net({k: x[k] for k in self.branch_input_keys})["b"]
        bct = self.BCtype_net({k: x[k] for k in self.BCtype_input_keys})["b"]
        bc = self.BC_net({k: x[k] for k in self.BC_input_keys})["b"]
        t = self.trunk_net({k: x[k] for k in self.trunk_input_keys})["t"]
        out = jnp.sum(b * bct * bc * t, axis=-1, keepdims=True)
        if self.use_bias:
            out = out + self.b
        return {self.output_keys[0]: out}


class Transformer(base.Arch):
    """Encoder-decoder transformer for symbolic regression
    (reference ppsci/arch/transformer.py)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        src_vocab_size: int = 512,
        tgt_vocab_size: int = 512,
        d_model: int = 256,
        num_heads: int = 8,
        num_layers: int = 4,
        d_ff: int = 1024,
        max_len: int = 256,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.d_model = d_model
        self.num_heads = num_heads
        self.src_embed = Embedding(src_vocab_size, d_model, rngs=rngs)
        self.tgt_embed = Embedding(tgt_vocab_size, d_model, rngs=rngs)
        self.enc_blocks = [
            _TransformerBlock(d_model, num_heads, d_ff, causal=False, rngs=rngs) for _ in range(num_layers)
        ]
        self.dec_blocks = [
            _TransformerBlock(d_model, num_heads, d_ff, causal=True, cross=True, rngs=rngs)
            for _ in range(num_layers)
        ]
        self.ln = LayerNorm(d_model)
        self.head = Linear(d_model, tgt_vocab_size, rngs=rngs)
        self.max_len = max_len

    def _pos(self, n):
        pos = jnp.arange(n, dtype=jnp.float32)[:, None]
        i = jnp.arange(self.d_model // 2, dtype=jnp.float32)[None, :]
        angle = pos / jnp.power(10000.0, 2 * i / self.d_model)
        pe = jnp.zeros((n, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(angle))
        pe = pe.at[:, 1::2].set(jnp.cos(angle))
        return pe

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        src = x[self.input_keys[0]].astype(jnp.int32)
        tgt = x[self.input_keys[1]].astype(jnp.int32) if len(self.input_keys) > 1 else src
        h = self.src_embed(src) + self._pos(src.shape[1])[None]
        for blk in self.enc_blocks:
            h = blk(h)
        d = self.tgt_embed(tgt) + self._pos(tgt.shape[1])[None]
        for blk in self.dec_blocks:
            d = blk(d, context=h)
        logits = self.head(self.ln(d))
        return {self.output_keys[0]: logits}


class _TransformerBlock(Module):
    def __init__(self, d_model, num_heads, d_ff, causal=False, cross=False, *, rngs: Rngs):
        self.ln1 = LayerNorm(d_model)
        self.qkv = Linear(d_model, 3 * d_model, rngs=rngs)
        self.proj = Linear(d_model, d_model, rngs=rngs)
        self.causal = causal
        self.cross = cross
        if cross:
            self.ln_x = LayerNorm(d_model)
            self.q_x = Linear(d_model, d_model, rngs=rngs)
            self.kv_x = Linear(d_model, 2 * d_model, rngs=rngs)
            self.proj_x = Linear(d_model, d_model, rngs=rngs)
        self.ln2 = LayerNorm(d_model)
        self.fc1 = Linear(d_model, d_ff, rngs=rngs)
        self.fc2 = Linear(d_ff, d_model, rngs=rngs)
        self.h = num_heads
        self.d = d_model

    def _mha(self, q, k, v, causal):
        B, T, E = q.shape
        S = k.shape[1]
        H = self.h
        q = q.reshape(B, T, H, E // H)
        k = k.reshape(B, S, H, E // H)
        v = v.reshape(B, S, H, E // H)
        att = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(E // H)
        if causal:
            mask = jnp.tril(jnp.ones((T, S), bool))
            att = jnp.where(mask[None, None], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, E)

    def __call__(self, x, context=None):
        h = self.ln1(x)
        qkv = self.qkv(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + self.proj(self._mha(q, k, v, self.causal))
        if self.cross and context is not None:
            hx = self.ln_x(x)
            q = self.q_x(hx)
            k, v = jnp.split(self.kv_x(context), 2, axis=-1)
            x = x + self.proj_x(self._mha(q, k, v, False))
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.ln2(x))))
        return x
