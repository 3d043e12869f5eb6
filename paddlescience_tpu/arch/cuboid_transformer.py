"""CuboidTransformer — Earthformer space-time transformer at reference
fidelity (reference ``ppsci/arch/cuboid_transformer.py`` +
``cuboid_transformer_encoder.py`` + ``cuboid_transformer_decoder.py`` +
``cuboid_transformer_utils.py``, ~4k LoC).

Non-autoregressive encoder-decoder:

  x -> initial conv encoder -> (+pos) -> hierarchical encoder -> mem_l
                                                                   |
  y <- final conv decoder <- hierarchical decoder (self + cross) <-+
                             ^ initial_z = nearest-interp(mem_l[-1], T_out)

Attention decomposition is **pattern-parametrized** exactly like the
reference (``cuboid_transformer_utils.py:203-347``): a named pattern
("axial", "divided_st", "video_swin_PxM", "spatial_lg_M",
"axial_space_dilate_K"; cross: "cross_KxK[_lg|_heter]") expands into a list
of attention layers per block, each with its own cuboid size, per-axis
local/dilated ("l"/"d") decomposition strategy, and shift. Explicit
per-layer lists are accepted too (reference ``enc_cuboid_size`` /
``enc_cuboid_strategy`` / ``enc_shift_size`` keys).

TPU-native design choices vs the reference's implementation:
  * cuboid partition/merge (``cuboid_reorder``) are pure reshapes/
    transposes for BOTH the local and dilated strategies; each cuboid's
    attention is one batched dense matmul on the MXU;
  * padding/shift attention masks are computed host-side in numpy per
    static (shape, cuboid, shift, strategy) config (lru_cached) and enter
    the program as constants — no dynamic masking paths under jit;
  * relative-position biases are static-index gathers from learned tables
    (reference CuboidSelfAttentionLayer use_relative_pos=True);
  * **global vectors** ride every self-attention layer: cuboid tokens
    attend over [cuboid ∪ global] keys and the globals update by attending
    over all tokens (reference cuboid_transformer_encoder.py:681-1165);
  * hierarchy: PatchMerge downsampling between encoder levels, nearest
    upsample + conv between decoder levels, channels doubling per level
    (reference downsample_type="patch_merge", upsample_type="upsample");
  * decoder per level: depth x [self-attention block + cross-attention
    block] into the matching encoder memory, with the reference's
    ``use_first_self_attn=False`` ordering (cross first at the coarsest
    level, reference cuboid_transformer_decoder.py:1203-1240) and
    ``dec_cross_start`` / ``cross_last_n_frames`` / ``n_temporal``
    temporal-interleave semantics (decoder.py:343-536);
  * remat=True wraps each block in jax.checkpoint (reference fleet
    recompute, cuboid_transformer_encoder.py:1170-1210).

Training fidelity: ``attn_drop`` / ``proj_drop`` / ``ffn_drop`` match the
reference's dropout sites (after masked softmax, after the output
projections, inside the FFNs — encoder.py:592-630,956-1060); dropout is
active whenever a train RNG is installed via ``set_train_rng`` and the
rates are nonzero. ``separate_global_qkv`` / ``global_dim_ratio`` /
``use_global_self_attn`` follow encoder.py:558-667. Known simplification:
the "nearest" padding type is not implemented (all shipped configs use
"ignore"/"zeros").
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, ModuleList, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, LayerNorm, Linear
from paddlescience_tpu.utils import initializer

__all__ = [
    "CuboidTransformer",
    "CuboidSelfAttention",
    "CuboidCrossAttention",
    "ExtFormerMoECuboid",
    "CuboidSelfAttentionPatterns",
    "CuboidCrossAttentionPatterns",
    "cuboid_reorder",
    "cuboid_reorder_reverse",
]


# --------------------------------------------------------------------------- #
# pattern registries (reference cuboid_transformer_utils.py:203-347)
# --------------------------------------------------------------------------- #


class _SelfPatterns:
    """Named self-attention decompositions. ``get(name)(input_shape)`` ->
    (cuboid_size, strategy, shift_size) lists, one entry per attention layer
    in the block (reference CuboidSelfAttentionPatterns)."""

    def __init__(self):
        self.patterns = {
            "full": self.full_attention,
            "axial": self.axial,
            "divided_st": self.divided_space_time,
        }
        for p in [1, 2, 4, 8, 10]:
            for m in [1, 2, 4, 8, 16, 32]:
                self.patterns[f"video_swin_{p}x{m}"] = functools.partial(
                    self.video_swin, P=p, M=m
                )
        for m in [1, 2, 4, 8, 16, 32]:
            self.patterns[f"spatial_lg_{m}"] = functools.partial(self.spatial_lg_v1, M=m)
        for k in [2, 4, 8]:
            self.patterns[f"axial_space_dilate_{k}"] = functools.partial(
                self.axial_space_dilate_K, K=k
            )

    def get(self, name):
        return self.patterns[name]

    def full_attention(self, input_shape):
        T, H, W = input_shape[:3]
        return [(T, H, W)], [("l", "l", "l")], [(0, 0, 0)]

    def axial(self, input_shape):
        """Axial attention (arXiv:1912.12180): attend along T, then H, then W."""
        T, H, W = input_shape[:3]
        cuboid_size = [(T, 1, 1), (1, H, 1), (1, 1, W)]
        strategy = [("l", "l", "l")] * 3
        shift_size = [(0, 0, 0)] * 3
        return cuboid_size, strategy, shift_size

    def divided_space_time(self, input_shape):
        T, H, W = input_shape[:3]
        return [(T, 1, 1), (1, H, W)], [("l", "l", "l")] * 2, [(0, 0, 0)] * 2

    def video_swin(self, input_shape, P=2, M=4):
        """Video Swin (arXiv:2106.13230): plain + shifted local windows."""
        T, H, W = input_shape[:3]
        P, M = min(P, T), min(M, H, W)
        cuboid_size = [(P, M, M), (P, M, M)]
        strategy = [("l", "l", "l")] * 2
        shift_size = [(0, 0, 0), (P // 2, M // 2, M // 2)]
        return cuboid_size, strategy, shift_size

    def spatial_lg_v1(self, input_shape, M=4):
        T, H, W = input_shape[:3]
        if H <= M and W <= M:
            cuboid_size = [(T, 1, 1), (1, H, W)]
            strategy = [("l", "l", "l")] * 2
            shift_size = [(0, 0, 0)] * 2
        else:
            cuboid_size = [(T, 1, 1), (1, M, M), (1, M, M)]
            strategy = [("l", "l", "l"), ("l", "l", "l"), ("d", "d", "d")]
            shift_size = [(0, 0, 0)] * 3
        return cuboid_size, strategy, shift_size

    def axial_space_dilate_K(self, input_shape, K=2):
        T, H, W = input_shape[:3]
        K = min(K, H, W)
        cuboid_size = [
            (T, 1, 1),
            (1, H // K, 1),
            (1, H // K, 1),
            (1, 1, W // K),
            (1, 1, W // K),
        ]
        strategy = [
            ("l", "l", "l"),
            ("d", "d", "d"),
            ("l", "l", "l"),
            ("d", "d", "d"),
            ("l", "l", "l"),
        ]
        shift_size = [(0, 0, 0)] * 5
        return cuboid_size, strategy, shift_size


class _CrossPatterns:
    """Named cross-attention decompositions. ``get(name)(mem_shape)`` ->
    (cuboid_hw, shift_hw, strategy, n_temporal) lists (reference
    CuboidCrossAttentionPatterns)."""

    def __init__(self):
        self.patterns = {}
        for k in [1, 2, 4, 8]:
            self.patterns[f"cross_{k}x{k}"] = functools.partial(self.cross_KxK, K=k)
            self.patterns[f"cross_{k}x{k}_lg"] = functools.partial(self.cross_KxK_lg, K=k)
            self.patterns[f"cross_{k}x{k}_heter"] = functools.partial(
                self.cross_KxK_heter, K=k
            )

    def get(self, name):
        return self.patterns[name]

    def cross_KxK(self, mem_shape, K):
        H, W = mem_shape[1], mem_shape[2]
        K = min(K, H, W)
        return [(K, K)], [(0, 0)], [("l", "l", "l")], [1]

    def cross_KxK_lg(self, mem_shape, K):
        H, W = mem_shape[1], mem_shape[2]
        K = min(K, H, W)
        return [(K, K)] * 2, [(0, 0)] * 2, [("l", "l", "l"), ("d", "d", "d")], [1, 1]

    def cross_KxK_heter(self, mem_shape, K):
        H, W = mem_shape[1], mem_shape[2]
        K = min(K, H, W)
        cuboid_hw = [(K, K)] * 3
        shift_hw = [(0, 0), (0, 0), (K // 2, K // 2)]
        strategy = [("l", "l", "l"), ("d", "d", "d"), ("l", "l", "l")]
        return cuboid_hw, shift_hw, strategy, [1, 1, 1]


CuboidSelfAttentionPatterns = _SelfPatterns()
CuboidCrossAttentionPatterns = _CrossPatterns()


# --------------------------------------------------------------------------- #
# cuboid decomposition (reference cuboid_transformer_encoder.py:243-451)
# --------------------------------------------------------------------------- #


def _clamp_cuboid(data_shape, cuboid_size, shift_size, strategy):
    """Clamp cuboid to the data shape; zero shifts on clamped or dilated axes
    (reference update_cuboid_size_shift_size, encoder.py:243-265)."""
    cub, shf = list(cuboid_size), list(shift_size)
    for i in range(3):
        if strategy[i] == "d":
            shf[i] = 0
        if data_shape[i] <= cuboid_size[i]:
            cub[i] = data_shape[i]
            shf[i] = 0
    return tuple(cub), tuple(shf)


def cuboid_reorder(x, cuboid_size, strategy):
    """(B, T, H, W, C) -> (B, num_cuboids, bT*bH*bW, C). Per-axis strategy:
    "l" groups contiguous blocks, "d" groups dilated (strided) blocks —
    both are one reshape + one transpose (reference cuboid_reorder,
    encoder.py:268-306)."""
    B, T, H, W, C = x.shape
    inter, nblock_axis, block_axis = [], [], []
    for i, (b, total, s) in enumerate(zip(cuboid_size, (T, H, W), strategy)):
        if s == "l":
            inter.extend([total // b, b])
            nblock_axis.append(2 * i + 1)
            block_axis.append(2 * i + 2)
        elif s == "d":
            inter.extend([b, total // b])
            nblock_axis.append(2 * i + 2)
            block_axis.append(2 * i + 1)
        else:
            raise NotImplementedError(f"strategy {s!r} is invalid")
    x = x.reshape((B, *inter, C))
    x = x.transpose((0, *nblock_axis, *block_axis, 7))
    nc = (T // cuboid_size[0]) * (H // cuboid_size[1]) * (W // cuboid_size[2])
    vol = cuboid_size[0] * cuboid_size[1] * cuboid_size[2]
    return x.reshape(B, nc, vol, C)


def cuboid_reorder_reverse(x, cuboid_size, strategy, orig_shape):
    """Inverse of :func:`cuboid_reorder` (reference encoder.py:409-451)."""
    B = x.shape[0]
    C = x.shape[-1]
    T, H, W = orig_shape
    perm = [0]
    for i, s in enumerate(strategy):
        if s == "l":
            perm.extend([i + 1, i + 4])
        elif s == "d":
            perm.extend([i + 4, i + 1])
        else:
            raise NotImplementedError(f"strategy {s!r} is invalid")
    perm.append(7)
    x = x.reshape(
        B,
        T // cuboid_size[0],
        H // cuboid_size[1],
        W // cuboid_size[2],
        cuboid_size[0],
        cuboid_size[1],
        cuboid_size[2],
        C,
    )
    return x.transpose(perm).reshape(B, T, H, W, C)


def _np_cuboid_reorder(data, cuboid_size, strategy):
    """numpy twin of cuboid_reorder for host-side mask construction."""
    B, T, H, W, C = data.shape
    inter, nblock_axis, block_axis = [], [], []
    for i, (b, total, s) in enumerate(zip(cuboid_size, (T, H, W), strategy)):
        if s == "l":
            inter.extend([total // b, b])
            nblock_axis.append(2 * i + 1)
            block_axis.append(2 * i + 2)
        else:
            inter.extend([b, total // b])
            nblock_axis.append(2 * i + 2)
            block_axis.append(2 * i + 1)
    data = data.reshape((B, *inter, C))
    data = data.transpose((0, *nblock_axis, *block_axis, 7))
    nc = (T // cuboid_size[0]) * (H // cuboid_size[1]) * (W // cuboid_size[2])
    vol = int(np.prod(cuboid_size))
    return data.reshape(B, nc, vol, C)


@functools.lru_cache(maxsize=256)
def _self_attn_mask(data_shape, cuboid_size, shift_size, strategy, padding_type):
    """Static (num_cuboids, vol, vol) bool mask combining padded-token
    exclusion ("ignore" padding) with Swin shift-region separation, or None
    when no masking is needed (reference
    compute_cuboid_self_attention_mask, encoder.py:309-380). Host-side
    numpy — the result enters the jit program as a constant."""
    T, H, W = data_shape
    pad_t = (cuboid_size[0] - T % cuboid_size[0]) % cuboid_size[0]
    pad_h = (cuboid_size[1] - H % cuboid_size[1]) % cuboid_size[1]
    pad_w = (cuboid_size[2] - W % cuboid_size[2]) % cuboid_size[2]
    padded = (pad_t or pad_h or pad_w) and padding_type == "ignore"
    shifted = any(s > 0 for s in shift_size)
    if not padded and not shifted:
        return None
    Tp, Hp, Wp = T + pad_t, H + pad_h, W + pad_w

    data_mask = np.ones((1, T, H, W, 1), dtype=bool)
    data_mask = np.pad(data_mask, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
    if shifted:
        data_mask = np.roll(
            data_mask, shift=(-shift_size[0], -shift_size[1], -shift_size[2]), axis=(1, 2, 3)
        )
    data_mask = _np_cuboid_reorder(data_mask, cuboid_size, strategy)[0, :, :, 0]

    # Slice triplets verbatim from the reference (encoder.py:355-371): for a
    # zero-shift axis the middle slice(-cub, -0) is empty and the final
    # slice(-0, None) re-covers the WHOLE axis, so that axis contributes no
    # region split — required for dilated cuboids straddling the -cub boundary.
    shift_mask = np.zeros((1, Tp, Hp, Wp, 1))
    cnt = 0
    for t in (
        slice(-cuboid_size[0]),
        slice(-cuboid_size[0], -shift_size[0]),
        slice(-shift_size[0], None),
    ):
        for h in (
            slice(-cuboid_size[1]),
            slice(-cuboid_size[1], -shift_size[1]),
            slice(-shift_size[1], None),
        ):
            for w in (
                slice(-cuboid_size[2]),
                slice(-cuboid_size[2], -shift_size[2]),
                slice(-shift_size[2], None),
            ):
                shift_mask[:, t, h, w, :] = cnt
                cnt += 1
    shift_mask = _np_cuboid_reorder(shift_mask, cuboid_size, strategy)[0, :, :, 0]
    mask = shift_mask[:, None, :] == shift_mask[:, :, None]
    if padding_type == "ignore":
        mask = mask & data_mask[:, None, :] & data_mask[:, :, None]
    return mask  # (nc, vol, vol)


@functools.lru_cache(maxsize=256)
def _cross_attn_mask(T_x, T_mem, H, W, n_temporal, cuboid_hw, shift_hw, strategy, padding_type):
    """Static (num_cuboids, x_vol, mem_vol) bool mask for cross attention:
    left-padded memory frames masked out, shift regions separated
    (reference compute_cuboid_cross_attention_mask, decoder.py:88-161)."""
    pad_t_mem = (n_temporal - T_mem % n_temporal) % n_temporal
    pad_t_x = (n_temporal - T_x % n_temporal) % n_temporal
    pad_h = (cuboid_hw[0] - H % cuboid_hw[0]) % cuboid_hw[0]
    pad_w = (cuboid_hw[1] - W % cuboid_hw[1]) % cuboid_hw[1]
    shifted = any(s > 0 for s in shift_hw)
    if not (pad_t_mem or pad_t_x or pad_h or pad_w) and not shifted:
        return None
    Hp, Wp = H + pad_h, W + pad_w
    mem_cuboid = ((T_mem + pad_t_mem) // n_temporal,) + tuple(cuboid_hw)
    x_cuboid = ((T_x + pad_t_x) // n_temporal,) + tuple(cuboid_hw)

    def _mk_mask(T, pad_t, t_pad_left, cuboid):
        m = np.ones((1, T, H, W, 1), dtype=bool)
        tpad = (pad_t, 0) if t_pad_left else (0, pad_t)
        m = np.pad(m, ((0, 0), tpad, (0, pad_h), (0, pad_w), (0, 0)))
        if shifted:
            m = np.roll(m, shift=(-shift_hw[0], -shift_hw[1]), axis=(2, 3))
        return _np_cuboid_reorder(m, cuboid, strategy)[0, :, :, 0]

    mem_mask = _mk_mask(T_mem, pad_t_mem, True, mem_cuboid)
    x_mask = _mk_mask(T_x, pad_t_x, False, x_cuboid)

    # Verbatim reference slices (decoder.py:136-147): zero-shift axes end with
    # slice(-0, None) = the whole axis, so they contribute no region split.
    shift_mask = np.zeros((1, 1, Hp, Wp, 1))
    cnt = 0
    for h in (
        slice(-cuboid_hw[0]),
        slice(-cuboid_hw[0], -shift_hw[0]),
        slice(-shift_hw[0], None),
    ):
        for w in (
            slice(-cuboid_hw[1]),
            slice(-cuboid_hw[1], -shift_hw[1]),
            slice(-shift_hw[1], None),
        ):
            shift_mask[:, :, h, w, :] = cnt
            cnt += 1
    sm = _np_cuboid_reorder(shift_mask, (1,) + tuple(cuboid_hw), strategy)[0, :, :, 0]
    # broadcast the per-spatial-window region ids over the temporal extents
    n_sp = sm.shape[0]
    xt = x_cuboid[0]
    mt = mem_cuboid[0]
    sm_x = np.tile(sm[:, None, :], (1, xt, 1)).reshape(n_sp, xt * sm.shape[1])
    sm_m = np.tile(sm[:, None, :], (1, mt, 1)).reshape(n_sp, mt * sm.shape[1])
    # temporal blocks tile over num_cuboids = n_temporal * n_spatial windows
    reps = x_mask.shape[0] // n_sp
    sm_x = np.tile(sm_x, (reps, 1))
    sm_m = np.tile(sm_m, (reps, 1))
    mask = sm_x[:, :, None] == sm_m[:, None, :]
    if padding_type == "ignore":
        mask = mask & x_mask[:, :, None] & mem_mask[:, None, :]
    return mask  # (nc, x_vol, mem_vol)


# --------------------------------------------------------------------------- #
# relative position bias (reference CuboidSelfAttentionLayer:541-620)
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=256)
def _relpos_index_self(cuboid_size):
    """(vol, vol) flat index into a ((2t-1)(2h-1)(2w-1)) table."""
    t, h, w = cuboid_size
    coords = np.stack(
        np.meshgrid(np.arange(t), np.arange(h), np.arange(w), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    rel = coords[:, None, :] - coords[None, :, :]  # (vol, vol, 3)
    rel = rel + np.array([t - 1, h - 1, w - 1])
    idx = (rel[..., 0] * (2 * h - 1) + rel[..., 1]) * (2 * w - 1) + rel[..., 2]
    return idx.astype(np.int32)


@functools.lru_cache(maxsize=256)
def _relpos_index_cross(t_x, t_mem, cuboid_hw, max_t_rel):
    """(x_vol, mem_vol) flat index into a ((2*max_t_rel-1)(2h-1)(2w-1))
    table; temporal offsets are clamped into the table range."""
    h, w = cuboid_hw
    cx = np.stack(
        np.meshgrid(np.arange(t_x), np.arange(h), np.arange(w), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    cm = np.stack(
        np.meshgrid(np.arange(t_mem), np.arange(h), np.arange(w), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    rel = cx[:, None, :] - cm[None, :, :]
    rel_t = np.clip(rel[..., 0] + max_t_rel - 1, 0, 2 * max_t_rel - 2)
    rel_h = rel[..., 1] + h - 1
    rel_w = rel[..., 2] + w - 1
    idx = (rel_t * (2 * h - 1) + rel_h) * (2 * w - 1) + rel_w
    return idx.astype(np.int32)


def _dropout(x, rate, key):
    """Inverted dropout; identity when no key (eval) or rate 0."""
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _masked_mha(q, k, v, heads, mask=None, bias=None, extra_kv=None,
                l2g_q=None, attn_drop=0.0, drop_key=None):
    """Cuboid-batched multi-head attention. q (B, nc, Lq, C), k/v
    (B, nc, Lk, C); ``mask`` (nc, Lq, Lk) static bool or None; ``bias``
    (heads, Lq, Lk) or None; ``extra_kv``: optional (B, G, C) pair of
    (k_g, v_g) global tokens appended to every cuboid's keys (never
    masked); ``l2g_q``: optional separate query projection (B, nc, Lq, C)
    used for the global-key scores (reference separate_global_qkv,
    encoder.py:746-757). ``attn_drop`` applies to the post-softmax weights
    (reference encoder.py:841). Fully-masked query rows produce zeros
    (reference masked_softmax semantics, encoder.py:383-406)."""
    B, nc, Lq, C = q.shape
    Lk = k.shape[2]
    d = C // heads
    qh = q.reshape(B, nc, Lq, heads, d)
    kh = k.reshape(B, nc, Lk, heads, d)
    vh = v.reshape(B, nc, Lk, heads, d)
    score = jnp.einsum("bnlhd,bnmhd->bnhlm", qh, kh) / math.sqrt(d)
    if bias is not None:
        score = score + bias[None, None]
    if extra_kv is not None:
        kg, vg = extra_kv  # (B, G, C)
        G = kg.shape[1]
        kgh = kg.reshape(B, G, heads, d)
        vgh = vg.reshape(B, G, heads, d)
        qg_h = (l2g_q if l2g_q is not None else q).reshape(B, nc, Lq, heads, d)
        g_score = jnp.einsum("bnlhd,bghd->bnhlg", qg_h, kgh) / math.sqrt(d)
        score = jnp.concatenate([score, g_score], axis=-1)
    if mask is not None:
        m = jnp.asarray(mask)
        if extra_kv is not None:
            m = jnp.pad(m, ((0, 0), (0, 0), (0, G)), constant_values=True)
        score = jnp.where(m[None, :, None], score, -1e9)
        att = jax.nn.softmax(score, axis=-1) * m[None, :, None]
    else:
        att = jax.nn.softmax(score, axis=-1)
    att = _dropout(att, attn_drop, drop_key)
    if extra_kv is not None:
        att_l, att_g = att[..., :Lk], att[..., Lk:]
        out = jnp.einsum("bnhlm,bnmhd->bnlhd", att_l, vh) + jnp.einsum(
            "bnhlg,bghd->bnlhd", att_g, vgh
        )
    else:
        out = jnp.einsum("bnhlm,bnmhd->bnlhd", att, vh)
    return out.reshape(B, nc, Lq, C)


class CuboidSelfAttention(Module):
    """One cuboid self-attention layer: local or dilated decomposition,
    optional shift, static padding/shift mask, relative-position bias, and
    optional global-vector pathway (reference CuboidSelfAttentionLayer,
    encoder.py:454-954)."""

    def __init__(self, dim: int, num_heads: int, cuboid_size: Tuple[int, int, int],
                 shift_size: Union[bool, Tuple[int, int, int]] = (0, 0, 0),
                 strategy: Tuple[str, str, str] = ("l", "l", "l"),
                 use_global: bool = False, use_relative_pos: bool = True,
                 padding_type: str = "ignore", attn_drop: float = 0.0,
                 proj_drop: float = 0.0, separate_global_qkv: bool = False,
                 global_dim_ratio: int = 1, use_global_self_attn: bool = False,
                 *, rngs: Rngs):
        if global_dim_ratio != 1 and not separate_global_qkv:
            raise ValueError(
                "global_dim_ratio != 1 requires separate_global_qkv=True "
                "(reference encoder.py:652-655)")
        self.qkv = Linear(dim, 3 * dim, rngs=rngs)
        self.proj = Linear(dim, dim, rngs=rngs)
        self.h = num_heads
        self.cuboid = tuple(cuboid_size)
        if isinstance(shift_size, bool):  # legacy: True = half-cuboid shift
            shift_size = tuple(c // 2 for c in self.cuboid) if shift_size else (0, 0, 0)
        self.shift = tuple(shift_size)
        self.strategy = tuple(strategy)
        self.padding_type = padding_type
        self.use_global = use_global
        self.use_relative_pos = use_relative_pos
        self.attn_drop = float(attn_drop)
        self.proj_drop = float(proj_drop)
        self.separate_global_qkv = separate_global_qkv
        self.global_dim_ratio = int(global_dim_ratio)
        self.use_global_self_attn = use_global_self_attn
        if use_relative_pos:
            t, h, w = self.cuboid
            n = (2 * t - 1) * (2 * h - 1) * (2 * w - 1)
            self.rel_bias = Param(
                initializer.trunc_normal_(0.0, 0.02)(rngs.params(), (n, num_heads)))
        if use_global:
            gdim = self.global_dim_ratio * dim
            self.g_norm = LayerNorm(gdim)
            if separate_global_qkv:
                # reference encoder.py:594-621: dedicated nets for the
                # local->global and global->local pathways
                self.l2g_q = Linear(dim, dim, rngs=rngs)
                self.l2g_global_kv = Linear(gdim, 2 * dim, rngs=rngs)
                self.g2l_global_q = Linear(gdim, dim, rngs=rngs)
                self.g2l_k = Linear(dim, dim, rngs=rngs)
                self.g2l_v = Linear(dim, gdim, rngs=rngs)
                if use_global_self_attn:
                    self.g2g_global_qkv = Linear(gdim, 3 * gdim, rngs=rngs)
            else:
                # shared projection of the global vectors (encoder.py:623-626)
                self.global_qkv = Linear(dim, 3 * dim, rngs=rngs)
            self.global_proj = Linear(gdim, gdim, rngs=rngs)

    def __call__(self, x, g=None, qkv_vol=None, key=None):
        """``qkv_vol``: optional precomputed (B, T, H, W, 3C) projection —
        the attention-MoE path routes the qkv projection per token on the
        full volume before cuboid decomposition. ``key``: train-mode PRNG
        key enabling attn/proj dropout. Returns ``(y, g_update)`` — the
        block adds both residuals (reference encoder.py:1166-1187)."""
        B, T, H, W, C = x.shape
        cub, shf = _clamp_cuboid((T, H, W), self.cuboid, self.shift, self.strategy)
        pad_t = (cub[0] - T % cub[0]) % cub[0]
        pad_h = (cub[1] - H % cub[1]) % cub[1]
        pad_w = (cub[2] - W % cub[2]) % cub[2]
        x_p = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0))) \
            if (pad_t or pad_h or pad_w) else x
        if qkv_vol is not None and (pad_t or pad_h or pad_w):
            qkv_vol = jnp.pad(qkv_vol, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
        if any(s > 0 for s in shf):
            x_p = jnp.roll(x_p, shift=(-shf[0], -shf[1], -shf[2]), axis=(1, 2, 3))
            if qkv_vol is not None:
                qkv_vol = jnp.roll(qkv_vol, shift=(-shf[0], -shf[1], -shf[2]), axis=(1, 2, 3))
        shape_p = x_p.shape
        tok = cuboid_reorder(x_p, cub, self.strategy)  # (B, nc, vol, C)
        if qkv_vol is None:
            qkv = self.qkv(tok).reshape(*tok.shape[:3], 3, C)
        else:
            qkv = cuboid_reorder(qkv_vol, cub, self.strategy).reshape(*tok.shape[:3], 3, C)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

        mask = _self_attn_mask((T, H, W), cub, shf, self.strategy, self.padding_type)
        bias = None
        if self.use_relative_pos:
            idx = _relpos_index_self(cub)
            if cub != self.cuboid:
                # clamped cuboid: recompute a valid index into the (larger)
                # table built for the configured cuboid
                t0, h0, w0 = self.cuboid
                t, h, w = cub
                coords = np.stack(
                    np.meshgrid(np.arange(t), np.arange(h), np.arange(w), indexing="ij"),
                    axis=-1).reshape(-1, 3)
                rel = coords[:, None, :] - coords[None, :, :] + np.array([t0 - 1, h0 - 1, w0 - 1])
                idx = ((rel[..., 0] * (2 * h0 - 1) + rel[..., 1]) * (2 * w0 - 1)
                       + rel[..., 2]).astype(np.int32)
            bias = self.rel_bias[jnp.asarray(idx)].transpose(2, 0, 1)  # (heads, vol, vol)

        k0 = k1 = k2 = k3 = None
        if key is not None:
            k0, k1, k2, k3 = jax.random.split(key, 4)

        extra_kv = l2g_q = None
        gn = qg = None
        if self.use_global and g is not None:
            gn = self.g_norm(g)
            G = g.shape[1]
            if self.separate_global_qkv:
                g_kv = self.l2g_global_kv(gn).reshape(B, G, 2, C)
                extra_kv = (g_kv[:, :, 0], g_kv[:, :, 1])
                l2g_q = self.l2g_q(tok)
            else:
                g_qkv = self.global_qkv(gn).reshape(B, G, 3, C)
                qg, extra_kv = g_qkv[:, :, 0], (g_qkv[:, :, 1], g_qkv[:, :, 2])
        out = _masked_mha(q, k, v, self.h, mask, bias, extra_kv, l2g_q=l2g_q,
                          attn_drop=self.attn_drop, drop_key=k0)
        out = _dropout(self.proj(out), self.proj_drop, k1)
        y = cuboid_reorder_reverse(out, cub, self.strategy, shape_p[1:4])
        if any(s > 0 for s in shf):
            y = jnp.roll(y, shift=(shf[0], shf[1], shf[2]), axis=(1, 2, 3))
        if pad_t or pad_h or pad_w:
            y = y[:, :T, :H, :W]
        if self.use_global and g is not None:
            # global->local update: globals attend over ALL (unpadded) tokens,
            # optionally concatenated with global self-attention
            # (reference encoder.py:847-918). Attending over the original
            # (unpadded, unshifted) volume is equivalent to the reference's
            # validity-masked attention over the padded one.
            gdim = self.global_dim_ratio * C
            d = C // self.h
            gd = self.global_dim_ratio * d
            flat = x.reshape(B, T * H * W, C)
            if self.separate_global_qkv:
                g_q = self.g2l_global_q(gn)              # (B, G, C)
                k_all = self.g2l_k(flat)                 # (B, L, C)
                v_all = self.g2l_v(flat)                 # (B, L, gdim)
            else:
                g_q = qg
                kv = self.qkv(flat).reshape(B, -1, 3, C)
                k_all, v_all = kv[:, :, 1], kv[:, :, 2]
            L = k_all.shape[1]
            qh = g_q.reshape(B, G, self.h, d)
            kh = k_all.reshape(B, L, self.h, d)
            vh = v_all.reshape(B, L, self.h, gd)
            score = jnp.einsum("bghd,blhd->bhgl", qh, kh) / math.sqrt(d)
            if self.use_global_self_attn:
                if self.separate_global_qkv:
                    gg = self.g2g_global_qkv(gn).reshape(B, G, 3, gdim)
                    gg_q = gg[:, :, 0].reshape(B, G, self.h, gd)
                    gg_k = gg[:, :, 1].reshape(B, G, self.h, gd)
                    gg_v = gg[:, :, 2].reshape(B, G, self.h, gd)
                else:
                    gg_q = qg.reshape(B, G, self.h, d)
                    gg_k = extra_kv[0].reshape(B, G, self.h, d)
                    gg_v = extra_kv[1].reshape(B, G, self.h, gd)
                # reference scales g2g scores by head_dim**-0.5 too
                gg_score = jnp.einsum("bghd,bmhd->bhgm", gg_q, gg_k) / math.sqrt(d)
                score = jnp.concatenate([score, gg_score], axis=-1)
                vh = jnp.concatenate([vh, gg_v.reshape(B, G, self.h, gd)], axis=1)
            att = jax.nn.softmax(score, axis=-1)
            att = _dropout(att, self.attn_drop, k2)
            g_upd = jnp.einsum("bhgl,blhd->bghd", att, vh).reshape(B, G, gdim)
            g_upd = _dropout(self.global_proj(g_upd), self.proj_drop, k3)
            return y, g_upd
        return y, None


class CuboidCrossAttention(Module):
    """Decoder cross-attention layer: queries from the decoder volume,
    keys/values from one encoder memory level, partitioned over (H, W)
    windows with ``n_temporal`` temporal interleaving (the T axis is split
    into n_temporal dilated groups so each query frame attends to the
    memory frames in its phase; reference CuboidCrossAttentionLayer,
    decoder.py:163-536)."""

    def __init__(self, dim, num_heads, cuboid_hw=(4, 4), shift_hw=(0, 0),
                 strategy=("l", "l", "l"), n_temporal: int = 1,
                 max_temporal_relative: int = 50, cross_last_n_frames: Optional[int] = None,
                 use_global=False, use_relative_pos=True, padding_type="ignore",
                 attn_drop: float = 0.0, proj_drop: float = 0.0,
                 global_dim_ratio: int = 1, *, rngs: Rngs):
        self.q = Linear(dim, dim, rngs=rngs)
        self.kv = Linear(dim, 2 * dim, rngs=rngs)
        self.proj = Linear(dim, dim, rngs=rngs)
        self.attn_drop = float(attn_drop)
        self.proj_drop = float(proj_drop)
        self.h = num_heads
        self.cuboid_hw = tuple(cuboid_hw)
        self.shift_hw = tuple(shift_hw)
        self.strategy = tuple(strategy)
        self.n_temporal = int(n_temporal)
        self.max_t_rel = max_temporal_relative
        self.cross_last_n_frames = cross_last_n_frames
        self.padding_type = padding_type
        self.use_global = use_global
        self.use_relative_pos = use_relative_pos
        if use_relative_pos:
            h, w = self.cuboid_hw
            n = (2 * max_temporal_relative - 1) * (2 * h - 1) * (2 * w - 1)
            self.rel_bias = Param(
                initializer.trunc_normal_(0.0, 0.02)(rngs.params(), (n, num_heads)))
        if use_global:
            # globals live at global_dim_ratio*dim channels (reference
            # decoder.py separate-global path)
            self.g_kv = Linear(global_dim_ratio * dim, 2 * dim, rngs=rngs)

    def __call__(self, x, mem, g=None, key=None):
        if self.cross_last_n_frames is not None:
            n_last = min(self.cross_last_n_frames, mem.shape[1])
            mem = mem[:, -n_last:]
        B, T_x, H, W, C = x.shape
        T_mem = mem.shape[1]
        ch, cw = (min(self.cuboid_hw[0], H), min(self.cuboid_hw[1], W))
        shf = tuple(s if c > 1 else 0 for s, c in zip(self.shift_hw, (ch, cw)))
        n_t = min(self.n_temporal, T_x, T_mem)
        pad_t_mem = (n_t - T_mem % n_t) % n_t
        pad_t_x = (n_t - T_x % n_t) % n_t
        pad_h = (ch - H % ch) % ch
        pad_w = (cw - W % cw) % cw
        # memory pads LEFT along T so the most recent frames stay aligned
        mem_p = jnp.pad(mem, ((0, 0), (pad_t_mem, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x_p = jnp.pad(x, ((0, 0), (0, pad_t_x), (0, pad_h), (0, pad_w), (0, 0)))
        if any(s > 0 for s in shf):
            x_p = jnp.roll(x_p, shift=(-shf[0], -shf[1]), axis=(2, 3))
            mem_p = jnp.roll(mem_p, shift=(-shf[0], -shf[1]), axis=(2, 3))
        mem_cub = (mem_p.shape[1] // n_t, ch, cw)
        x_cub = (x_p.shape[1] // n_t, ch, cw)
        rx = cuboid_reorder(x_p, x_cub, self.strategy)  # (B, nc, x_vol, C)
        rm = cuboid_reorder(mem_p, mem_cub, self.strategy)
        q = self.q(rx)
        kv = self.kv(rm).reshape(*rm.shape[:3], 2, C)
        k, v = kv[..., 0, :], kv[..., 1, :]

        mask = _cross_attn_mask(T_x, T_mem, H, W, n_t, (ch, cw), shf,
                                self.strategy, self.padding_type)
        bias = None
        if self.use_relative_pos:
            idx = _relpos_index_cross(x_cub[0], mem_cub[0], (ch, cw), self.max_t_rel)
            if (ch, cw) != self.cuboid_hw:
                h0, w0 = self.cuboid_hw
                cx = np.stack(np.meshgrid(np.arange(x_cub[0]), np.arange(ch),
                                          np.arange(cw), indexing="ij"), axis=-1).reshape(-1, 3)
                cm = np.stack(np.meshgrid(np.arange(mem_cub[0]), np.arange(ch),
                                          np.arange(cw), indexing="ij"), axis=-1).reshape(-1, 3)
                rel = cx[:, None, :] - cm[None, :, :]
                rel_t = np.clip(rel[..., 0] + self.max_t_rel - 1, 0, 2 * self.max_t_rel - 2)
                idx = ((rel_t * (2 * h0 - 1) + rel[..., 1] + h0 - 1) * (2 * w0 - 1)
                       + rel[..., 2] + w0 - 1).astype(np.int32)
            bias = self.rel_bias[jnp.asarray(idx)].transpose(2, 0, 1)

        k0 = k1 = None
        if key is not None:
            k0, k1 = jax.random.split(key)
        extra_kv = None
        if self.use_global and g is not None:
            g_kv = self.g_kv(g).reshape(B, g.shape[1], 2, C)
            extra_kv = (g_kv[:, :, 0], g_kv[:, :, 1])
        out = _masked_mha(q, k, v, self.h, mask, bias, extra_kv,
                          attn_drop=self.attn_drop, drop_key=k0)
        out = _dropout(self.proj(out), self.proj_drop, k1)
        y = cuboid_reorder_reverse(out, x_cub, self.strategy, x_p.shape[1:4])
        if any(s > 0 for s in shf):
            y = jnp.roll(y, shift=(shf[0], shf[1]), axis=(2, 3))
        return y[:, :T_x, :H, :W]


class _FFN(Module):
    """Positionwise FFN with the reference's two dropout sites: activation
    dropout after gelu and output dropout after fc2 (reference
    PositionwiseFFN with activation_dropout=dropout=ffn_drop,
    cuboid_transformer.py:73-130)."""

    def __init__(self, dim, hidden, ffn_drop: float = 0.0, out_dim=None, *, rngs: Rngs):
        self.fc1 = Linear(dim, hidden, rngs=rngs)
        self.fc2 = Linear(hidden, out_dim or dim, rngs=rngs)
        self.ffn_drop = float(ffn_drop)

    def __call__(self, x, key=None):
        ka = kb = None
        if key is not None:
            ka, kb = jax.random.split(key)
        h = _dropout(jax.nn.gelu(self.fc1(x)), self.ffn_drop, ka)
        return _dropout(self.fc2(h), self.ffn_drop, kb)


class _CuboidBlock(Module):
    """Stack of pre-norm cuboid self-attention layers, each followed by its
    own FFN (reference StackCuboidSelfAttentionBlock with
    use_inter_ffn=True, encoder.py:956-1232), with global-vector pathway.
    ``layers``: list of (cuboid_size, strategy, shift_size) — one pattern
    expansion. With ``moe_config`` every FFN becomes a noisy-top-k
    ``MixtureFFN`` and (when use_attn_moe) each qkv projection a
    ``MixtureLinear`` (reference extformer_moe_cuboid_encoder.py:1764-1976);
    blocks then return a third element: the gate's load-balancing aux loss."""

    def __init__(self, dim, num_heads, layers, mlp_ratio,
                 moe_config=None, expert_shape=None, use_global=False,
                 use_relative_pos=True, padding_type="ignore",
                 attn_drop: float = 0.0, proj_drop: float = 0.0,
                 ffn_drop: float = 0.0, separate_global_qkv: bool = False,
                 global_dim_ratio: int = 1, use_global_self_attn: bool = False,
                 use_global_vector_ffn: bool = True, *, rngs: Rngs):
        from paddlescience_tpu.arch.extformer_moe import MixtureFFN, MixtureLinear

        self.use_moe = bool(moe_config) and moe_config.get("use_ffn_moe", True)
        self.use_attn_moe = bool(moe_config) and moe_config.get("use_attn_moe", False)
        self.use_global = use_global
        self.use_global_vector_ffn = use_global_vector_ffn
        attns, ffns, ln1, ln2, qkv_moes, g_ffns = [], [], [], [], [], []
        gdim = global_dim_ratio * dim
        for (cub, strat, shift) in layers:
            ln1.append(LayerNorm(dim))
            attns.append(CuboidSelfAttention(
                dim, num_heads, cub, shift, strat, use_global=use_global,
                use_relative_pos=use_relative_pos, padding_type=padding_type,
                attn_drop=attn_drop, proj_drop=proj_drop,
                separate_global_qkv=separate_global_qkv,
                global_dim_ratio=global_dim_ratio,
                use_global_self_attn=use_global_self_attn, rngs=rngs))
            ln2.append(LayerNorm(dim))
            if self.use_moe:
                ffns.append(MixtureFFN(dim, int(dim * mlp_ratio), expert_shape, moe_config, rngs=rngs))
            else:
                ffns.append(_FFN(dim, int(dim * mlp_ratio), ffn_drop, rngs=rngs))
            if use_global and use_global_vector_ffn:
                # per-attn global FFN at ratio*dim (reference encoder.py:1073-1092)
                g_ffns.append(_FFN(gdim, int(gdim * mlp_ratio), ffn_drop, rngs=rngs))
            if self.use_attn_moe:
                # qkv routed per token on the full volume before cuboid
                # decomposition (reference MixtureSelfAttention wraps the
                # attention projections as MixtureLinear)
                qkv_moes.append(MixtureLinear(dim, 3 * dim, expert_shape, moe_config, rngs=rngs))
        self.attns = ModuleList(attns)
        self.ffns = ModuleList(ffns)
        self.ln1 = ModuleList(ln1)
        self.ln2 = ModuleList(ln2)
        if self.use_attn_moe:
            self.qkv_moes = ModuleList(qkv_moes)
        if use_global and use_global_vector_ffn:
            self.g_ffns = ModuleList(g_ffns)
            self.g_lns = ModuleList([LayerNorm(gdim) for _ in layers])

    def __call__(self, x, g=None, moe_key=None):
        aux = jnp.zeros(())
        for i, (attn, ffn) in enumerate(zip(self.attns, self.ffns)):
            lkey = None if moe_key is None else jax.random.fold_in(moe_key, i)
            akey = fkey = gkey = None
            if lkey is not None:
                akey, fkey, gkey = jax.random.split(lkey, 3)
            xn = self.ln1[i](x)
            if self.use_attn_moe:
                qkv_vol, a_aux = self.qkv_moes[i](xn, moe_key)
                aux = aux + a_aux
                a, g_upd = attn(xn, g, qkv_vol=qkv_vol, key=akey)
            else:
                a, g_upd = attn(xn, g, key=akey)
            x = x + a
            if g_upd is not None:
                g = g + g_upd
                if self.use_global_vector_ffn:
                    g = g + self.g_ffns[i](self.g_lns[i](g), gkey)
            if self.use_moe:
                y, m_aux = ffn(self.ln2[i](x), moe_key)
                x = x + y
                aux = aux + m_aux
            else:
                x = x + ffn(self.ln2[i](x), fkey)
        return x, g, aux


class _CrossBlock(Module):
    """Stack of pre-norm cuboid cross-attention layers into one encoder
    memory level, each followed by its own FFN (reference
    StackCuboidCrossAttentionBlock, decoder.py:539-745). ``layers``: list of
    (cuboid_hw, shift_hw, strategy, n_temporal)."""

    def __init__(self, dim, num_heads, layers, mlp_ratio, max_temporal_relative=50,
                 cross_last_n_frames=None, use_global=False, use_relative_pos=True,
                 padding_type="ignore", attn_drop: float = 0.0,
                 proj_drop: float = 0.0, ffn_drop: float = 0.0,
                 global_dim_ratio: int = 1, moe_config=None, expert_shape=None,
                 *, rngs: Rngs):
        from paddlescience_tpu.arch.extformer_moe import MixtureFFN

        # reference decoder cross blocks carry MoE FFNs too when use_ffn_moe
        # (extformer_moe_cuboid_decoder.py:595-845)
        self.use_moe = bool(moe_config) and moe_config.get("use_ffn_moe", True)
        attns, ffns, ln_q, ln_kv, ln2 = [], [], [], [], []
        for (chw, shw, strat, n_t) in layers:
            ln_q.append(LayerNorm(dim))
            ln_kv.append(LayerNorm(dim))
            attns.append(CuboidCrossAttention(
                dim, num_heads, chw, shw, strat, n_t, max_temporal_relative,
                cross_last_n_frames, use_global=use_global,
                use_relative_pos=use_relative_pos, padding_type=padding_type,
                attn_drop=attn_drop, proj_drop=proj_drop,
                global_dim_ratio=global_dim_ratio, rngs=rngs))
            ln2.append(LayerNorm(dim))
            if self.use_moe:
                ffns.append(MixtureFFN(dim, int(dim * mlp_ratio), expert_shape, moe_config, rngs=rngs))
            else:
                ffns.append(_FFN(dim, int(dim * mlp_ratio), ffn_drop, rngs=rngs))
        self.attns = ModuleList(attns)
        self.ffns = ModuleList(ffns)
        self.ln_q = ModuleList(ln_q)
        self.ln_kv = ModuleList(ln_kv)
        self.ln2 = ModuleList(ln2)

    def __call__(self, x, mem, g=None, key=None):
        aux = jnp.zeros(())
        for i, (attn, ffn) in enumerate(zip(self.attns, self.ffns)):
            lkey = None if key is None else jax.random.fold_in(key, i)
            akey = fkey = None
            if lkey is not None:
                akey, fkey = jax.random.split(lkey)
            x = x + attn(self.ln_q[i](x), self.ln_kv[i](mem), g, key=akey)
            if self.use_moe:
                y, m_aux = ffn(self.ln2[i](x), key)
                x = x + y
                aux = aux + m_aux
            else:
                x = x + ffn(self.ln2[i](x), fkey)
        return x, aux


class _PatchMerge(Module):
    """2x2 spatial merge + channel projection (reference
    PatchMerging3D, cuboid_transformer_encoder.py)."""

    def __init__(self, dim, out_dim, *, rngs: Rngs):
        self.norm = LayerNorm(4 * dim)
        self.reduction = Linear(4 * dim, out_dim, rngs=rngs)

    def __call__(self, x):
        B, T, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            H, W = H + pad_h, W + pad_w
        x = x.reshape(B, T, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, H // 2, W // 2, 4 * C)
        return self.reduction(self.norm(x))


class _Upsample3D(Module):
    """Nearest spatial upsample + conv (reference Upsample3DLayer,
    cuboid_transformer_decoder.py:748)."""

    def __init__(self, dim, out_dim, kernel=3, *, rngs: Rngs):
        self.conv = Conv(dim, out_dim, (kernel, kernel), padding="SAME", rngs=rngs)

    def __call__(self, x, target_hw):
        B, T, H, W, C = x.shape
        x = x.reshape(B * T, H, W, C)
        x = jax.image.resize(x, (B * T, target_hw[0], target_hw[1], C), "nearest")
        x = self.conv(x)
        return x.reshape(B, T, target_hw[0], target_hw[1], -1)


class _InitialEncoder(Module):
    """K x Conv2D downsample stack + projection (reference InitialEncoder,
    cuboid_transformer.py:19-118)."""

    def __init__(self, c_in, dim, num_conv=2, *, rngs: Rngs):
        convs = []
        c = c_in
        for _ in range(num_conv):
            convs.append(Conv(c, dim, (3, 3), padding="SAME", rngs=rngs))
            c = dim
        self.convs = convs
        self.norm = LayerNorm(dim)

    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        for conv in self.convs:
            h = jax.nn.leaky_relu(conv(h), 0.1)
        h = h.reshape(B, T, H, W, -1)
        return self.norm(h)


class _FinalDecoder(Module):
    """K x Conv2D + projection head (reference FinalDecoder,
    cuboid_transformer.py:120-194)."""

    def __init__(self, dim, c_out, num_conv=2, *, rngs: Rngs):
        self.convs = [Conv(dim, dim, (3, 3), padding="SAME", rngs=rngs) for _ in range(num_conv)]
        self.norm = LayerNorm(dim)
        self.head = Linear(dim, c_out, rngs=rngs)

    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        for conv in self.convs:
            h = jax.nn.leaky_relu(conv(h), 0.1)
        h = h.reshape(B, T, H, W, C)
        return self.head(self.norm(h))


class ExtFormerMoECuboid(base.Arch):
    """Cuboid transformer with noisy-top-k MoE routing (reference
    ppsci/arch/extformer_moe_cuboid.py + extformer_moe_cuboid_encoder.py:
    1678-1877 + extformer_moe_utils.py:9-416). Same I/O contract as
    CuboidTransformer plus an ``aux_loss`` output carrying the summed gate
    load-balancing losses (wire it into the training loss with the
    importance/load weights set in ``moe_config``).

    ``moe_config`` keys follow the reference conf
    (examples/extformer_moe/conf yaml:110-119): num_experts, out_planes
    (top-k), gate_style (linear | spatial-latent | cuboid-latent |
    spatial-latent-linear | cuboid-latent-linear), dispatch_style,
    aux_loss_style (all | cell), importance_weight, load_weight,
    use_ffn_moe, use_attn_moe."""

    def __init__(self, input_keys, output_keys, input_shape, target_shape, base_units=64,
                 num_heads=4, enc_depth=(2,), dec_depth=(2,), cuboid_size=(2, 4, 4),
                 mlp_ratio=4.0, num_experts=4, moe_config: Optional[Dict] = None,
                 *, rngs: Optional[Rngs] = None, **kwargs):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        if moe_config is None:
            from paddlescience_tpu.arch.extformer_moe import default_moe_config

            moe_config = default_moe_config(
                num_experts=num_experts, out_planes=min(4, max(2, num_experts)))
        self.inner = CuboidTransformer(
            input_keys, output_keys, input_shape, target_shape, base_units, num_heads,
            enc_depth, dec_depth, cuboid_size, mlp_ratio,
            moe_config=moe_config, rngs=rngs, **kwargs,
        )
        self.input_keys = self.inner.input_keys
        self.output_keys = self.inner.output_keys
        self.moe_config = moe_config

    def set_train_rng(self, key) -> None:
        self.inner.set_train_rng(key)

    def __call__(self, x):
        return self.inner(x)


def _expand_self_layers(pattern, shape, cuboid_size, strategy, shift, depth):
    """Per-depth layer lists for one level. ``pattern`` (a name from
    CuboidSelfAttentionPatterns) wins; otherwise explicit lists; otherwise
    the legacy single-cuboid mode (one layer per block, alternating
    half-shift — this repo's pre-pattern behavior; note pre-pattern
    checkpoints do NOT load unmodified: blocks now hold ModuleLists and a
    default rel_bias param)."""
    if pattern is not None:
        cs, st, sh = CuboidSelfAttentionPatterns.get(pattern)(shape)
        layers = list(zip([tuple(c) for c in cs], [tuple(s) for s in st],
                          [tuple(s) for s in sh]))
        return [layers for _ in range(depth)]
    if cuboid_size and isinstance(cuboid_size[0], (tuple, list)):
        layers = list(zip([tuple(c) for c in cuboid_size],
                          [tuple(s) for s in strategy],
                          [tuple(s) for s in shift]))
        return [layers for _ in range(depth)]
    # legacy: one attention layer per block, odd blocks half-shifted
    cub = tuple(cuboid_size)
    return [
        [(cub, ("l", "l", "l"),
          tuple(c // 2 for c in cub) if d % 2 == 1 else (0, 0, 0))]
        for d in range(depth)
    ]


def _expand_cross_layers(pattern, mem_shape, cuboid_hw, shift_hw, strategy, n_temporal):
    """Cross-layer list for one level from a named pattern or explicit lists."""
    if pattern is not None:
        chw, shw, st, nt = CuboidCrossAttentionPatterns.get(pattern)(mem_shape)
        return list(zip([tuple(c) for c in chw], [tuple(s) for s in shw],
                        [tuple(s) for s in st], list(nt)))
    if cuboid_hw and isinstance(cuboid_hw[0], (tuple, list)):
        return list(zip([tuple(c) for c in cuboid_hw], [tuple(s) for s in shift_hw],
                        [tuple(s) for s in strategy], list(n_temporal)))
    return [(tuple(cuboid_hw), (0, 0), ("l", "l", "l"), 1)]


class CuboidTransformer(base.Arch):
    """Earthformer-style hierarchical encoder-decoder for spatiotemporal
    forecasting (reference cuboid_transformer.py:415-958).

    I/O: input (B, T_in, H, W, C_in) -> output (B, T_out, H, W, C_out).
    ``enc_depth``/``dec_depth`` give per-level block counts; spatial
    resolution halves (PatchMerge) and channels double between levels.

    Attention decomposition per level is set by ``self_pattern`` /
    ``cross_self_pattern`` / ``cross_pattern`` (names from the pattern
    registries — the reference's defaults are axial/axial/cross_1x1), or by
    the explicit ``enc_cuboid_size``/``enc_cuboid_strategy``/
    ``enc_shift_size`` (and dec_*) lists, or — when neither is given — by
    the legacy single ``cuboid_size`` (one local layer per block, odd
    blocks half-shifted)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        input_shape: Tuple[int, int, int, int],
        target_shape: Tuple[int, int, int, int],
        base_units: int = 64,
        num_heads: int = 4,
        enc_depth: Tuple[int, ...] = (4, 4),
        dec_depth: Tuple[int, ...] = (2, 2),
        cuboid_size: Tuple[int, int, int] = (2, 4, 4),
        mlp_ratio: float = 4.0,
        downsample: int = 2,
        remat: bool = False,
        num_experts: int = 0,
        moe_config: Optional[Dict] = None,
        num_global_vectors: int = 4,
        dec_cross_cuboid_hw: Tuple[int, int] = (4, 4),
        initial_conv_layers: int = 2,
        final_conv_layers: int = 2,
        # pattern-parametrized attention (reference defaults: axial family)
        self_pattern: Optional[str] = None,
        cross_self_pattern: Optional[str] = None,
        cross_pattern: Optional[str] = None,
        enc_cuboid_size=None,
        enc_cuboid_strategy=None,
        enc_shift_size=None,
        dec_self_cuboid_size=None,
        dec_self_cuboid_strategy=None,
        dec_self_shift_size=None,
        dec_cross_cuboid_strategy=None,
        dec_cross_shift_hw=None,
        dec_cross_n_temporal=None,
        dec_cross_start: int = 0,
        dec_use_first_self_attn: bool = False,
        cross_last_n_frames: Optional[int] = None,
        use_relative_pos: bool = True,
        padding_type: str = "ignore",
        z_init_method: str = "nearest_interp",
        attn_drop: float = 0.0,
        proj_drop: float = 0.0,
        ffn_drop: float = 0.0,
        separate_global_qkv: bool = False,
        global_dim_ratio: int = 1,
        use_global_self_attn: bool = False,
        use_global_vector_ffn: bool = True,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        T_in, H, W, C_in = input_shape
        T_out, _, _, C_out = target_shape
        self.T_in, self.T_out, self.C_out = T_in, T_out, C_out
        self.remat = remat
        self.num_levels = len(enc_depth)
        if len(dec_depth) != self.num_levels:
            raise ValueError(f"dec_depth {dec_depth} must have one entry per encoder level {enc_depth}")
        self.num_global = num_global_vectors
        self.dec_cross_start = dec_cross_start
        self.use_first_self_attn = dec_use_first_self_attn
        if z_init_method not in ("zeros", "nearest_interp", "last", "mean"):
            raise ValueError(f"z_init_method {z_init_method!r} invalid")
        self.z_init_method = z_init_method

        dims = [base_units * (2**i) for i in range(self.num_levels)]
        self.dims = dims
        hw = [(max(H >> i, 1), max(W >> i, 1)) for i in range(self.num_levels)]
        self.hw = hw
        # per-level memory shapes (T, H, W, C) seen by the attention stacks
        enc_shapes = [(T_in, hw[i][0], hw[i][1], dims[i]) for i in range(self.num_levels)]
        dec_shapes = [(T_out, hw[i][0], hw[i][1], dims[i]) for i in range(self.num_levels)]

        # MoE: explicit moe_config (reference extformer_moe conf keys), or
        # the compat shorthand num_experts>0 -> noisy top-k with defaults
        if moe_config is None and num_experts > 0:
            from paddlescience_tpu.arch.extformer_moe import default_moe_config

            moe_config = default_moe_config(
                num_experts=num_experts, out_planes=min(4, max(2, num_experts)))
        self.moe_config = moe_config
        self._moe_rng = None

        self.initial_encoder = _InitialEncoder(C_in, base_units, initial_conv_layers, rngs=rngs)
        self.pos = Param(initializer.trunc_normal_(0.0, 0.02)(rngs.params(), (1, T_in, H, W, base_units)))
        self.global_dim_ratio = int(global_dim_ratio)
        self._has_dropout = max(attn_drop, proj_drop, ffn_drop) > 0.0
        if self.num_global > 0:
            gbase = self.global_dim_ratio * base_units
            self.init_global = Param(
                initializer.trunc_normal_(0.0, 0.02)(rngs.params(), (1, self.num_global, gbase)))
            # per-level global projections track the channel doubling
            self.g_proj = [
                Linear(self.global_dim_ratio * dims[i],
                       self.global_dim_ratio * dims[i + 1], rngs=rngs)
                for i in range(self.num_levels - 1)
            ]

        enc_levels, mergers = [], []
        for lev, depth in enumerate(enc_depth):
            per_block = _expand_self_layers(
                self_pattern, enc_shapes[lev], enc_cuboid_size or cuboid_size,
                enc_cuboid_strategy, enc_shift_size, depth)
            blocks = [
                _CuboidBlock(dims[lev], num_heads, layers, mlp_ratio,
                             moe_config, (T_in, *hw[lev]),
                             use_global=self.num_global > 0,
                             use_relative_pos=use_relative_pos,
                             padding_type=padding_type,
                             attn_drop=attn_drop, proj_drop=proj_drop,
                             ffn_drop=ffn_drop,
                             separate_global_qkv=separate_global_qkv,
                             global_dim_ratio=global_dim_ratio,
                             use_global_self_attn=use_global_self_attn,
                             use_global_vector_ffn=use_global_vector_ffn,
                             rngs=rngs)
                for layers in per_block
            ]
            enc_levels.append(ModuleList(blocks))
            if lev < self.num_levels - 1:
                mergers.append(_PatchMerge(dims[lev], dims[lev + 1], rngs=rngs))
        self.enc_levels = enc_levels
        self.mergers = mergers

        # decoder built coarsest -> finest; per level depth x [self + cross]
        # (reference CuboidTransformerDecoder.forward, decoder.py:1193-1245);
        # with use_first_self_attn=False the coarsest level leads with cross
        max_t_rel = T_in + T_out
        dec_self, dec_cross, upsamplers = [], [], []
        for i, lev in enumerate(reversed(range(self.num_levels))):
            n_self = dec_depth[lev]
            if not self.use_first_self_attn and i == 0:
                n_self = max(n_self - 1, 0)
            self_layers = _expand_self_layers(
                cross_self_pattern, dec_shapes[lev],
                dec_self_cuboid_size or cuboid_size,
                dec_self_cuboid_strategy, dec_self_shift_size, max(n_self, 1))
            dec_self.append(ModuleList([
                _CuboidBlock(dims[lev], num_heads, self_layers[d], mlp_ratio,
                             moe_config, (T_out, *hw[lev]), use_global=False,
                             use_relative_pos=use_relative_pos,
                             padding_type=padding_type,
                             attn_drop=attn_drop, proj_drop=proj_drop,
                             ffn_drop=ffn_drop, rngs=rngs)
                for d in range(n_self)
            ]))
            cross_layers = _expand_cross_layers(
                cross_pattern, enc_shapes[lev], dec_cross_cuboid_hw,
                dec_cross_shift_hw, dec_cross_cuboid_strategy, dec_cross_n_temporal)
            n_cross = dec_depth[lev] if lev >= dec_cross_start else 0
            dec_cross.append(ModuleList([
                _CrossBlock(dims[lev], num_heads, cross_layers, mlp_ratio,
                            max_temporal_relative=max_t_rel,
                            cross_last_n_frames=cross_last_n_frames,
                            use_global=self.num_global > 0,
                            use_relative_pos=use_relative_pos,
                            padding_type=padding_type,
                            attn_drop=attn_drop, proj_drop=proj_drop,
                            ffn_drop=ffn_drop, global_dim_ratio=global_dim_ratio,
                            moe_config=moe_config, expert_shape=(T_out, *hw[lev]),
                            rngs=rngs)
                for _ in range(n_cross)
            ]))
            if lev > 0:
                upsamplers.append(_Upsample3D(dims[lev], dims[lev - 1], rngs=rngs))
        self.dec_self = dec_self
        self.dec_cross = dec_cross
        self.upsamplers = upsamplers

        self.final_decoder = _FinalDecoder(base_units, C_out, final_conv_layers, rngs=rngs)

    def _maybe_ckpt(self, fn, *args):
        return jax.checkpoint(fn)(*args) if self.remat else fn(*args)

    def set_train_rng(self, key) -> None:
        """Enable noisy MoE gating + aux losses for subsequent calls (pass a
        fresh key per step inside the traced loss for per-step noise;
        ``None`` restores deterministic eval routing)."""
        self._moe_rng = key

    def _initial_z(self, final_mem):
        """Decoder seed from the coarsest memory (reference
        get_initial_z, cuboid_transformer.py:878-918)."""
        if self.z_init_method == "zeros":
            B, _, Hc, Wc, C = final_mem.shape
            return jnp.zeros((B, self.T_out, Hc, Wc, C), final_mem.dtype)
        if self.z_init_method == "last":
            return jnp.repeat(final_mem[:, -1:], self.T_out, axis=1)
        if self.z_init_method == "mean":
            return jnp.repeat(final_mem.mean(axis=1, keepdims=True), self.T_out, axis=1)
        idx = jnp.clip(
            (jnp.arange(self.T_out) * final_mem.shape[1]) // max(self.T_out, 1),
            0, final_mem.shape[1] - 1)
        return jnp.take(final_mem, idx, axis=1)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        h = x[self.input_keys[0]]  # (B, T, H, W, C)
        B = h.shape[0]
        h = self.initial_encoder(h) + self.pos

        moe_keys = iter([])
        if self._moe_rng is not None and (self.moe_config is not None or self._has_dropout):
            n_blocks = (sum(len(b) for b in self.enc_levels)
                        + sum(len(b) for b in self.dec_self)
                        + sum(len(b) for b in self.dec_cross))
            moe_keys = iter(list(jax.random.split(self._moe_rng, n_blocks)))
        next_key = lambda: next(moe_keys, None)
        total_aux = jnp.zeros(())

        g = None
        if self.num_global > 0:
            g = jnp.broadcast_to(self.init_global, (B,) + self.init_global.shape[1:])

        # ---- hierarchical encoder: collect one memory per level -----------
        mem_l, g_l = [], []
        for lev, blocks in enumerate(self.enc_levels):
            for blk in blocks:
                h, g, aux = self._maybe_ckpt(blk, h, g, next_key())
                total_aux = total_aux + aux
            mem_l.append(h)
            g_l.append(g)
            if lev < self.num_levels - 1:
                h = self.mergers[lev](h)
                if g is not None:
                    g = self.g_proj[lev](g)

        z = self._initial_z(mem_l[-1])

        # ---- hierarchical decoder: coarse -> fine, cross into memories ----
        for i, lev in enumerate(reversed(range(self.num_levels))):
            selfs = list(self.dec_self[i])
            crosses = list(self.dec_cross[i])
            if not self.use_first_self_attn and i == 0 and crosses:
                # coarsest level leads with cross-attention (reference
                # use_first_self_attn=False path, decoder.py:1207-1225)
                z, aux = self._maybe_ckpt(crosses[0], z, mem_l[lev], g_l[lev], next_key())
                total_aux = total_aux + aux
                crosses = crosses[1:]
            for d, sblk in enumerate(selfs):
                z, _, aux = self._maybe_ckpt(sblk, z, None, next_key())
                total_aux = total_aux + aux
                if d < len(crosses):
                    z, aux = self._maybe_ckpt(crosses[d], z, mem_l[lev], g_l[lev], next_key())
                    total_aux = total_aux + aux
            if lev > 0:
                z = self.upsamplers[i](z, self.hw[lev - 1])

        out = self.final_decoder(z)
        result = {self.output_keys[0]: out}
        if self.moe_config is not None:
            # gate load-balancing aux losses, summed over all MoE blocks
            # (reference aggregate_aux_losses, extformer_moe_utils.py:318-323)
            result["aux_loss"] = total_aux.reshape(1, 1)
        if self._output_transform is not None:
            result = self._output_transform(x, result)
        return result
