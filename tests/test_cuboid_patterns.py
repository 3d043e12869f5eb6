"""Cuboid attention-pattern registry + l/d decomposition + masks
(arch/cuboid_transformer.py; reference cuboid_transformer_utils.py:203-347,
cuboid_transformer_encoder.py:243-451, cuboid_transformer_decoder.py:88-536).
"""

import numpy as np
import pytest

import paddlescience_tpu as psci
from paddlescience_tpu.arch import cuboid_transformer as ct


def test_cuboid_reorder_local_dilated_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((2, 4, 8, 8, 3)).astype(np.float32)
    for strategy in [("l", "l", "l"), ("d", "d", "d"), ("l", "d", "l"), ("d", "l", "d")]:
        cub = (2, 4, 2)
        r = np.asarray(ct.cuboid_reorder(x, cub, strategy))
        assert r.shape == (2, (4 // 2) * (8 // 4) * (8 // 2), 2 * 4 * 2, 3)
        back = np.asarray(ct.cuboid_reorder_reverse(r, cub, strategy, (4, 8, 8)))
        np.testing.assert_array_equal(back, x)


def test_cuboid_reorder_dilated_strides():
    """Dilated ("d") groups tokens with stride = n_blocks along the axis —
    cuboid 0 on a dilated T axis holds frames {0, T/b, 2T/b, ...}."""
    T = 8
    x = np.arange(T, dtype=np.float32).reshape(1, T, 1, 1, 1)
    r = np.asarray(ct.cuboid_reorder(x, (2, 1, 1), ("d", "l", "l")))
    # 4 cuboids of 2 tokens; cuboid 0 = frames (0, 4), cuboid 1 = (1, 5), ...
    np.testing.assert_array_equal(r[0, :, :, 0], [[0, 4], [1, 5], [2, 6], [3, 7]])
    r_local = np.asarray(ct.cuboid_reorder(x, (2, 1, 1), ("l", "l", "l")))
    np.testing.assert_array_equal(r_local[0, :, :, 0], [[0, 1], [2, 3], [4, 5], [6, 7]])


def test_self_pattern_registry_matches_reference_semantics():
    """Expansions match the reference tables
    (cuboid_transformer_utils.py:228-300)."""
    shape = (4, 16, 16, 32)  # (T, H, W, C)
    cs, st, sh = ct.CuboidSelfAttentionPatterns.get("axial")(shape)
    assert cs == [(4, 1, 1), (1, 16, 1), (1, 1, 16)]
    assert st == [("l", "l", "l")] * 3 and sh == [(0, 0, 0)] * 3

    cs, st, sh = ct.CuboidSelfAttentionPatterns.get("divided_st")(shape)
    assert cs == [(4, 1, 1), (1, 16, 16)]

    cs, st, sh = ct.CuboidSelfAttentionPatterns.get("video_swin_2x4")(shape)
    assert cs == [(2, 4, 4)] * 2 and sh == [(0, 0, 0), (1, 2, 2)]

    cs, st, sh = ct.CuboidSelfAttentionPatterns.get("spatial_lg_4")(shape)
    assert cs == [(4, 1, 1), (1, 4, 4), (1, 4, 4)]
    assert st == [("l", "l", "l"), ("l", "l", "l"), ("d", "d", "d")]

    cs, st, sh = ct.CuboidSelfAttentionPatterns.get("axial_space_dilate_2")(shape)
    assert cs == [(4, 1, 1), (1, 8, 1), (1, 8, 1), (1, 1, 8), (1, 1, 8)]
    assert st[1] == ("d", "d", "d") and st[2] == ("l", "l", "l")

    # small spatial dims fall back to the T,1,1 / 1,H,W split
    cs, st, sh = ct.CuboidSelfAttentionPatterns.get("spatial_lg_4")((4, 4, 4, 32))
    assert cs == [(4, 1, 1), (1, 4, 4)]


def test_cross_pattern_registry():
    mem_shape = (4, 16, 16, 32)
    chw, shw, st, nt = ct.CuboidCrossAttentionPatterns.get("cross_1x1")(mem_shape)
    assert chw == [(1, 1)] and nt == [1]
    chw, shw, st, nt = ct.CuboidCrossAttentionPatterns.get("cross_4x4_lg")(mem_shape)
    assert chw == [(4, 4)] * 2 and st[1] == ("d", "d", "d")
    chw, shw, st, nt = ct.CuboidCrossAttentionPatterns.get("cross_4x4_heter")(mem_shape)
    assert shw == [(0, 0), (0, 0), (2, 2)] and len(nt) == 3


def test_self_attn_mask_none_when_divisible_unshifted():
    assert ct._self_attn_mask((4, 8, 8), (2, 4, 4), (0, 0, 0), ("l", "l", "l"), "ignore") is None
    m = ct._self_attn_mask((4, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore")
    assert m is not None and m.dtype == bool
    nc = (4 // 2) * (8 // 4) * (8 // 4)
    assert m.shape == (nc, 32, 32)
    # padding masks out padded keys for every query in affected cuboids
    m2 = ct._self_attn_mask((3, 8, 8), (2, 4, 4), (0, 0, 0), ("l", "l", "l"), "ignore")
    assert m2 is not None and (~m2).any()


def test_cuboid_self_attention_shift_equals_unshifted_when_window_is_full():
    """When the cuboid covers the whole volume, shift is zeroed (clamped) and
    the layer must equal the unshifted one."""
    from paddlescience_tpu.nn.core import Rngs

    rng = np.random.default_rng(1)
    x = rng.random((2, 2, 4, 4, 16)).astype(np.float32)
    a1 = ct.CuboidSelfAttention(16, 4, (2, 4, 4), (1, 2, 2), ("l", "l", "l"), rngs=Rngs(0))
    a2 = ct.CuboidSelfAttention(16, 4, (2, 4, 4), (0, 0, 0), ("l", "l", "l"), rngs=Rngs(0))
    y1, _ = a1(x)
    y2, _ = a2(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)


def test_cuboid_self_attention_padding_ignore_invariance():
    """"ignore" padding: the output on real tokens must not depend on the
    (zero-)padded tail — compare a 3-frame input under cuboid (2,.) against
    the same input where the pad frame region of the volume is filled with
    garbage before the layer pads it itself."""
    from paddlescience_tpu.nn.core import Rngs

    rng = np.random.default_rng(2)
    x = rng.random((1, 3, 4, 4, 16)).astype(np.float32)
    layer = ct.CuboidSelfAttention(16, 4, (2, 1, 1), (0, 0, 0), ("l", "l", "l"), rngs=Rngs(0))
    y, _ = layer(x)
    assert np.asarray(y).shape == (1, 3, 4, 4, 16)
    assert np.isfinite(np.asarray(y)).all()
    # frame 2 sits alone in its cuboid with a masked pad partner: its output
    # must equal attention over itself only — compute via a T=1 slice
    y_slice, _ = layer(x[:, 2:3])
    np.testing.assert_allclose(np.asarray(y[:, 2]), np.asarray(y_slice[:, 0]), rtol=1e-5, atol=1e-6)


def test_cross_attention_n_temporal_shapes_and_finite():
    from paddlescience_tpu.nn.core import Rngs

    rng = np.random.default_rng(3)
    x = rng.random((2, 6, 8, 8, 16)).astype(np.float32)
    mem = rng.random((2, 5, 8, 8, 16)).astype(np.float32)
    for n_t in (1, 2, 3):
        layer = ct.CuboidCrossAttention(16, 4, (4, 4), (0, 0), ("l", "l", "l"),
                                        n_temporal=n_t, max_temporal_relative=12, rngs=Rngs(0))
        y = layer(x, mem)
        assert np.asarray(y).shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_cuboid_transformer_reference_default_patterns():
    """The reference's default config (self_pattern="axial",
    cross_self_pattern="axial", cross_pattern="cross_1x1",
    use_first_self_attn=False — cuboid_transformer.py:560-581) builds and
    runs; axial expands to 3 attention layers per block."""
    import jax

    m = psci.arch.CuboidTransformer(
        ("input",), ("output",), input_shape=(4, 8, 8, 2), target_shape=(6, 8, 8, 1),
        base_units=16, num_heads=4, enc_depth=(1, 1), dec_depth=(2, 2),
        self_pattern="axial", cross_self_pattern="axial", cross_pattern="cross_1x1",
        num_global_vectors=2)
    # axial = 3 attention layers (and 3 FFNs) per encoder block
    assert len(m.enc_levels[0][0].attns) == 3
    # coarsest decoder level: use_first_self_attn=False drops one self block
    assert len(m.dec_self[0]) == 1 and len(m.dec_cross[0]) == 2
    assert len(m.dec_self[1]) == 2 and len(m.dec_cross[1]) == 2
    x = {"input": np.random.rand(2, 4, 8, 8, 2).astype(np.float32)}
    out = m(x)["output"]
    assert out.shape == (2, 6, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()

    def loss(pt):
        m.load_param_tree(pt)
        return ((m(x)["output"]) ** 2).mean()

    g = jax.grad(loss)(m.param_tree())
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


def test_cuboid_transformer_video_swin_nondivisible():
    """video_swin pattern with shapes that don't divide the window: the
    padded+masked path must stay finite and shape-correct."""
    m = psci.arch.CuboidTransformer(
        ("input",), ("output",), input_shape=(3, 10, 10, 1), target_shape=(2, 10, 10, 1),
        base_units=16, num_heads=2, enc_depth=(1,), dec_depth=(1,),
        self_pattern="video_swin_2x4", cross_self_pattern="divided_st",
        cross_pattern="cross_4x4_heter", num_global_vectors=0)
    x = {"input": np.random.rand(1, 3, 10, 10, 1).astype(np.float32)}
    out = m(x)["output"]
    assert out.shape == (1, 2, 10, 10, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cuboid_transformer_explicit_layer_lists():
    """Explicit enc_cuboid_size/strategy/shift lists (the reference's
    non-pattern config route, cuboid_transformer.py:525-530)."""
    m = psci.arch.CuboidTransformer(
        ("input",), ("output",), input_shape=(4, 8, 8, 1), target_shape=(4, 8, 8, 1),
        base_units=16, num_heads=2, enc_depth=(1,), dec_depth=(1,),
        enc_cuboid_size=[(2, 4, 4), (2, 4, 4)],
        enc_cuboid_strategy=[("l", "l", "l"), ("d", "d", "d")],
        enc_shift_size=[(0, 0, 0), (0, 0, 0)],
        num_global_vectors=0)
    assert len(m.enc_levels[0][0].attns) == 2
    assert m.enc_levels[0][0].attns[1].strategy == ("d", "d", "d")
    x = {"input": np.random.rand(1, 4, 8, 8, 1).astype(np.float32)}
    assert np.isfinite(np.asarray(m(x)["output"])).all()


def test_cuboid_transformer_z_init_methods():
    for method in ("zeros", "last", "mean", "nearest_interp"):
        m = psci.arch.CuboidTransformer(
            ("input",), ("output",), input_shape=(2, 8, 8, 1), target_shape=(3, 8, 8, 1),
            base_units=16, num_heads=2, enc_depth=(1,), dec_depth=(1,),
            cuboid_size=(2, 4, 4), num_global_vectors=0, z_init_method=method)
        x = {"input": np.random.rand(1, 2, 8, 8, 1).astype(np.float32)}
        assert m(x)["output"].shape == (1, 3, 8, 8, 1)


def _oracle_self_attn_mask(data_shape, cuboid_size, shift_size, strategy, padding_type):
    """Straight-line reimplementation of the reference's
    compute_cuboid_self_attention_mask (cuboid_transformer_encoder.py:309-380)
    in numpy — the region-id slice triplets verbatim, including the
    zero-shift final slice(-0, None) covering the whole axis."""
    T, H, W = data_shape
    pad_t = (cuboid_size[0] - T % cuboid_size[0]) % cuboid_size[0]
    pad_h = (cuboid_size[1] - H % cuboid_size[1]) % cuboid_size[1]
    pad_w = (cuboid_size[2] - W % cuboid_size[2]) % cuboid_size[2]
    Tp, Hp, Wp = T + pad_t, H + pad_h, W + pad_w
    data_mask = np.ones((1, T, H, W, 1), dtype=bool)
    data_mask = np.pad(data_mask, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
    if any(s > 0 for s in shift_size):
        data_mask = np.roll(
            data_mask, shift=(-shift_size[0], -shift_size[1], -shift_size[2]), axis=(1, 2, 3))
    data_mask = ct._np_cuboid_reorder(data_mask, cuboid_size, strategy)[0, :, :, 0]
    shift_mask = np.zeros((1, Tp, Hp, Wp, 1))
    cnt = 0
    for t in (slice(-cuboid_size[0]), slice(-cuboid_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for h in (slice(-cuboid_size[1]), slice(-cuboid_size[1], -shift_size[1]),
                  slice(-shift_size[1], None)):
            for w in (slice(-cuboid_size[2]), slice(-cuboid_size[2], -shift_size[2]),
                      slice(-shift_size[2], None)):
                shift_mask[:, t, h, w, :] = cnt
                cnt += 1
    shift_mask = ct._np_cuboid_reorder(shift_mask, cuboid_size, strategy)[0, :, :, 0]
    mask = shift_mask[:, None, :] == shift_mask[:, :, None]
    if padding_type == "ignore":
        mask = mask & data_mask[:, None, :] & data_mask[:, :, None]
    return mask


@pytest.mark.parametrize(
    "shape,cub,shift,strategy",
    [
        # the advisor's counterexample: dilated axis + padding, zero shift
        ((1, 6, 1), (1, 4, 1), (0, 0, 0), ("l", "d", "l")),
        ((1, 6, 1), (1, 4, 1), (0, 2, 0), ("l", "d", "l")),
        ((3, 8, 8), (2, 4, 4), (0, 0, 0), ("l", "l", "l")),
        ((4, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l")),
        ((4, 6, 10), (2, 4, 4), (0, 2, 2), ("l", "d", "l")),
        ((5, 7, 8), (2, 4, 4), (1, 0, 2), ("d", "l", "d")),
    ],
)
def test_self_attn_mask_matches_reference_oracle(shape, cub, shift, strategy):
    got = ct._self_attn_mask(shape, cub, shift, strategy, "ignore")
    want = _oracle_self_attn_mask(shape, cub, shift, strategy, "ignore")
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), want)
