"""Arch zoo forward-shape and semantics tests (reference doctests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlescience_tpu as psci


def test_mlp_shapes():
    model = psci.arch.MLP(("x", "y"), ("u", "v"), 5, 128)
    out = jax.jit(model)({"x": jnp.ones((64, 1)), "y": jnp.ones((64, 1))})
    assert out["u"].shape == (64, 1) and out["v"].shape == (64, 1)


def test_mlp_fourier_period_rwf():
    model = psci.arch.MLP(
        ("t", "x"),
        ("u",),
        4,
        32,
        periods={"x": (2.0, False)},
        fourier={"dim": 32, "scale": 1.0},
        random_weight={"mean": 0.5, "std": 0.1},
    )
    out = jax.jit(model)({"t": jnp.ones((8, 1)), "x": jnp.ones((8, 1))})
    assert out["u"].shape == (8, 1)
    # period embedding: output must be 2-periodic in x
    o1 = jax.jit(model)({"t": jnp.zeros((4, 1)), "x": jnp.asarray([[0.1], [0.3], [0.5], [0.7]])})
    o2 = jax.jit(model)({"t": jnp.zeros((4, 1)), "x": jnp.asarray([[2.1], [2.3], [2.5], [2.7]])})
    np.testing.assert_allclose(np.asarray(o1["u"]), np.asarray(o2["u"]), atol=1e-5)


def test_modified_mlp_and_piratenet():
    for cls, kw in ((psci.arch.ModifiedMLP, {"num_layers": 3}), (psci.arch.PirateNet, {"num_blocks": 2})):
        model = cls(("x", "y"), ("u",), hidden_size=16, fourier={"dim": 16, "scale": 1.0}, **kw)
        out = jax.jit(model)({"x": jnp.ones((8, 1)), "y": jnp.ones((8, 1))})
        assert out["u"].shape == (8, 1)


def test_piratenet_identity_at_init():
    """alpha=0 at init => blocks are identity (physics init property)."""
    model = psci.arch.PirateNet(("x",), ("u",), 2, 8, fourier={"dim": 8, "scale": 1.0})
    x = {"x": jnp.linspace(0, 1, 5).reshape(-1, 1)}
    emb = model.fourier_emb(x["x"])
    got = jax.jit(model)(x)["u"]
    want = model.last_fc(emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_deeponet():
    model = psci.arch.DeepONet("u", "y", "G", 100, 40, 1, 1, 40, 40)
    out = jax.jit(model)({"u": jnp.ones((200, 100)), "y": jnp.ones((200, 1))})
    assert out["G"].shape == (200, 1)


def test_fno_1d_2d():
    m1 = psci.arch.TFNO1dNet(("input",), ("output",), n_modes_height=8, hidden_channels=16, in_channels=2, out_channels=1, n_layers=2, lifting_channels=16, projection_channels=16)
    out = jax.jit(m1)({"input": jnp.ones((4, 2, 32))})
    assert out["output"].shape == (4, 1, 32)

    m2 = psci.arch.TFNO2dNet(
        ("input",), ("output",), n_modes_height=6, n_modes_width=6, hidden_channels=8,
        in_channels=1, out_channels=3, n_layers=2, lifting_channels=8, projection_channels=8,
        use_mlp=True, mlp={"expansion": 1.0},
    )
    out = jax.jit(m2)({"input": jnp.ones((2, 1, 16, 16))})
    assert out["output"].shape == (2, 3, 16, 16)


def test_fno_spectral_conv_lowpass():
    """A constant field passes through spectral conv unchanged up to the
    learned DC-mode weight (all other modes zero)."""
    from paddlescience_tpu import nn
    from paddlescience_tpu.arch.fno import SpectralConv

    conv = SpectralConv(1, 1, (4,), rngs=nn.Rngs(0))
    x = jnp.ones((1, 1, 32))
    y = jax.jit(conv)(x)
    assert y.shape == x.shape
    yv = np.asarray(y)
    np.testing.assert_allclose(yv, np.full_like(yv, yv.flat[0]), atol=1e-5, rtol=1e-5)  # still constant


def test_spinn():
    model = psci.arch.SPINN(("x", "y", "z"), ("u", "v"), r=8, num_layers=2, hidden_size=16)
    out = jax.jit(model)({"x": jnp.ones((3, 1)), "y": jnp.ones((4, 1)), "z": jnp.ones((5, 1))})
    assert out["u"].shape == (3, 4, 5, 1)
    assert out["v"].shape == (3, 4, 5, 1)


def test_lno():
    T = np.linspace(0, 1, 32).reshape(1, -1)
    model = psci.arch.LNO(("input",), ("output",), width=8, modes=(4,), T=T, in_features=1, hidden_features=16)
    out = jax.jit(model)({"input": jnp.ones((2, 32, 1))})
    assert out["output"].shape == (2, 32, 1)


def test_model_list():
    m1 = psci.arch.MLP(("x",), ("u",), 2, 8)
    m2 = psci.arch.MLP(("y",), ("v",), 2, 8)
    ml = psci.arch.ModelList((m1, m2))
    out = jax.jit(ml)({"x": jnp.ones((4, 1)), "y": jnp.ones((4, 1))})
    assert set(out) == {"u", "v"}
    # one parameter tree spanning both models
    assert set(ml.param_tree()["model_list"].keys()) == {"0", "1"}


def test_output_transform():
    model = psci.arch.MLP(("x",), ("u",), 2, 8)
    model.register_output_transform(lambda inp, out: {"u": out["u"] * 0 + 7.0})
    out = jax.jit(model)({"x": jnp.ones((4, 1))})
    np.testing.assert_allclose(np.asarray(out["u"]), 7.0)


def test_spectral_conv_factorizations():
    """CP/Tucker factorized spectral convs (reference fno_block.py:542-1045):
    params scale with rank, and the factorized contraction equals the dense
    contraction with the reconstructed weight."""
    import jax
    import jax.numpy as jnp
    from paddlescience_tpu.arch.fno import SpectralConv

    x = jnp.asarray(np.random.rand(2, 4, 12, 12).astype(np.float32))

    def n_params(m):
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(m.param_tree()))

    dense = SpectralConv(4, 6, (5, 5), rngs=psci.nn.Rngs(0))
    tuck_hi = SpectralConv(4, 6, (5, 5), factorization="tucker", rank=1.0, rngs=psci.nn.Rngs(0))
    tuck_lo = SpectralConv(4, 6, (5, 5), factorization="tucker", rank=0.25, rngs=psci.nn.Rngs(0))
    cp = SpectralConv(4, 6, (5, 5), factorization="cp", rank=0.5, rngs=psci.nn.Rngs(0))
    assert n_params(tuck_lo) < n_params(tuck_hi)
    assert n_params(cp) < n_params(dense)

    for m in (dense, tuck_hi, tuck_lo, cp):
        y = m(x)
        assert y.shape == (2, 6, 12, 12)
        assert np.isfinite(np.asarray(y)).all()

    # factorized contraction == dense contraction with reconstructed weight.
    # n_modes (5,5) keeps corner_modes (5//2, 5//2+1) = (2, 3) coefficients
    # per corner (reference total-mode-count semantics, fno_block.py:720-745)
    for fac in ("tucker", "cp"):
        m = SpectralConv(4, 6, (5, 5), factorization=fac, rank=0.5, rngs=psci.nn.Rngs(1))
        assert m.corner_modes == (2, 3)
        xc = jnp.asarray((np.random.rand(2, 4, 2, 3) + 1j * np.random.rand(2, 4, 2, 3)).astype(np.complex64))
        if fac == "cp":
            lam = m.w0_lam_re + 1j * m.w0_lam_im
            a, b = m._cfac(0, 0), m._cfac(0, 1)
            f1, f2 = m._cfac(0, 2), m._cfac(0, 3)
            w = jnp.einsum("r,ir,or,jr,kr->iojk", lam, a, b, f1, f2)
        else:
            core = m.w0_core_re + 1j * m.w0_core_im
            a, b = m._cfac(0, 0), m._cfac(0, 1)
            f1, f2 = m._cfac(0, 2), m._cfac(0, 3)
            w = jnp.einsum("pqrs,ip,oq,jr,ks->iojk", core, a, b, f1, f2)
        y_fac = m._contract(0, xc, (slice(0, 2), slice(0, 3)))
        y_dense = jnp.einsum("bijk,iojk->bojk", xc, w)
        np.testing.assert_allclose(np.asarray(y_fac), np.asarray(y_dense), rtol=2e-4, atol=1e-5)


def test_cuboid_transformer_hierarchy():
    """3-level hierarchical CuboidTransformer (reference
    cuboid_transformer.py:415-958): PatchMerge downsampling, channel doubling,
    global vectors, cross-attention decoder, nearest-interp initial z."""
    import jax

    m = psci.arch.CuboidTransformer(
        ("input",), ("output",), input_shape=(8, 16, 16, 2), target_shape=(4, 16, 16, 1),
        base_units=16, num_heads=4, enc_depth=(1, 1, 1), dec_depth=(1, 1, 1),
        cuboid_size=(2, 4, 4), num_global_vectors=2)
    x = {"input": np.random.rand(2, 8, 16, 16, 2).astype(np.float32)}
    out = m(x)["output"]
    assert out.shape == (2, 4, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
    # hierarchy: per-level dims double (16, 32, 64)
    assert m.dims == [16, 32, 64]
    assert m.hw == [(16, 16), (8, 8), (4, 4)]
    # params live under registered children (trainable through param_tree)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(m.param_tree()))
    assert n > 100_000
    # remat variant agrees with the plain forward
    m2 = psci.arch.CuboidTransformer(
        ("input",), ("output",), (8, 16, 16, 2), (4, 16, 16, 1),
        base_units=16, num_heads=4, enc_depth=(1, 1, 1), dec_depth=(1, 1, 1),
        cuboid_size=(2, 4, 4), num_global_vectors=2, remat=True)
    m2.load_param_tree(m.param_tree())
    np.testing.assert_allclose(np.asarray(m2(x)["output"]), np.asarray(out), rtol=2e-5, atol=1e-6)


def test_moflow_glow_logdet_and_roundtrip():
    """MoFlow Glow structure (reference moflow_glow.py): exact reverse and
    analytic log-det equal to the autodiff jacobian determinant of the
    block-triangular (nodes, edges) -> (z_x, z_adj) map."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    m = psci.arch.MoFlowNet(b_n_type=4, a_n_node=9, a_n_type=5, b_hidden=32,
                            a_hidden=16, b_n_blocks=2, a_n_blocks=2)
    nodes = jnp.asarray(rng.random((2, 9, 5)), jnp.float32)
    edges = jnp.asarray(rng.random((2, 4, 9, 9)), jnp.float32)
    out = m({"nodes": nodes, "edges": edges})
    n2, e2 = m.reverse(out["output"])
    assert float(jnp.abs(n2 - nodes).max()) < 1e-3
    assert float(jnp.abs(e2 - edges).max()) < 1e-3

    mt = psci.arch.MoFlowNet(b_n_type=2, a_n_node=3, a_n_type=2, b_hidden=8,
                             a_hidden=8, b_n_blocks=1, a_n_blocks=1,
                             rngs=psci.nn.Rngs(3))

    def flat_fwd(v):
        nd = v[:6].reshape(1, 3, 2)
        ed = v[6:].reshape(1, 2, 3, 3)
        return mt({"nodes": nd, "edges": ed})["output"][0]

    v0 = jnp.asarray(rng.random(24), jnp.float32)
    J = jax.jacfwd(flat_fwd)(v0)
    _, ld_x = jnp.linalg.slogdet(J[:6, :6])
    _, ld_adj = jnp.linalg.slogdet(J[6:, 6:])
    o = mt({"nodes": v0[:6].reshape(1, 3, 2), "edges": v0[6:].reshape(1, 2, 3, 3)})
    np.testing.assert_allclose(float(o["sum_log_det"][0]), float(ld_x + ld_adj), atol=1e-3)


def test_graphcast_multimesh():
    """GraphCast multi-mesh (reference graphcast.py): icosahedral refinement
    union edges, grid2mesh/mesh2grid bipartite passes, grid-shaped output."""
    import jax.numpy as jnp
    from paddlescience_tpu.arch.graph_nets import build_multimesh

    v1, s1, _ = build_multimesh(1)
    v2, s2, _ = build_multimesh(2)
    assert v1.shape == (42, 3) and v2.shape == (162, 3)
    assert len(s2) > len(s1)  # multi-mesh union grows with refinement
    np.testing.assert_allclose(np.linalg.norm(v2, axis=1), 1.0, rtol=1e-5)

    m = psci.arch.GraphCastNet(("grid",), ("pred",), node_in_dim=8, out_dim=8,
                               hidden=16, n_layers=2, lat=8, lon=16, mesh_level=1)
    x = jnp.asarray(np.random.rand(128, 8), np.float32)
    out = m({"grid": x})["pred"]
    assert out.shape == (128, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_amgnet_coarsening_unet():
    """AMGNet greedy aggregation (pyamg stand-in, reference amgnet.py):
    aggregates partition the node set; the 7-tuple V-cycle input runs and
    matches the flat 4-tuple in output shape."""
    import jax.numpy as jnp
    from paddlescience_tpu.data.dataset.domain_dataset import make_synthetic_graph

    rng = np.random.default_rng(0)
    nf, ef, s, r, _ = make_synthetic_graph(rng, n_nodes=48, k=4)
    assign, cs, cr = psci.arch.AMGNet.coarsen(s, r, len(nf))
    assert assign.min() >= 0 and assign.max() + 1 < len(nf)  # real coarsening
    m = psci.arch.AMGNet(("input",), ("pred",), node_in_dim=nf.shape[-1],
                         edge_in_dim=ef.shape[-1], out_dim=3, hidden=16, n_layers=4)
    out_mg = m({"input": (jnp.asarray(nf), jnp.asarray(ef), jnp.asarray(s),
                          jnp.asarray(r), assign, jnp.asarray(cs), jnp.asarray(cr))})["pred"]
    out_flat = m({"input": (jnp.asarray(nf), jnp.asarray(ef), jnp.asarray(s), jnp.asarray(r))})["pred"]
    assert out_mg.shape == out_flat.shape == (48, 3)
    assert np.isfinite(np.asarray(out_mg)).all()


def test_dgmr_latent_ensemble_and_discriminators():
    """DGMR at reference structure (conditioning pyramid to H/32, latent
    LBlock+attention stack, 4-level ConvGRU sampler): distinct PRNG keys give
    distinct samples; generation_steps>1 returns the ensemble; discriminators
    score (B,). Reference ppsci/arch/dgmr.py:15-115."""
    import jax
    import jax.numpy as jnp

    m = psci.arch.DGMR(("input_frames",), ("future_frames",),
                       forecast_steps=4, input_channels=1, latent_channels=32,
                       context_channels=32, num_input_frames=4, generation_steps=2,
                       output_shape=64)
    x = {"input_frames": jnp.asarray(np.random.rand(2, 4, 1, 64, 64), jnp.float32)}
    out = m(x)
    assert out["future_frames"].shape == (2, 4, 1, 64, 64)
    assert out["samples"].shape == (2, 2, 4, 1, 64, 64)
    # different rng -> different samples (the latent stack is live)
    m.set_rng(jax.random.PRNGKey(7))
    out2 = m(x)
    assert not np.allclose(np.asarray(out["future_frames"]), np.asarray(out2["future_frames"]))

    disc = psci.arch.DGMRDiscriminators(input_channels=1)
    s, t = disc(out["future_frames"])
    assert s.shape == (2,) and t.shape == (2,)


def test_dgmr_structure_fidelity():
    """Reference-structure checks (ppsci/arch/dgmr.py): 4-scale conditioning
    pyramid with the documented channel widths, latent stack output
    (1, H/32, W/32, latent), spectral-norm weights have unit top singular
    value, and the default config's parameter count is in the reference
    class (~54M generator + ~45M discriminators)."""
    import jax
    import jax.numpy as jnp

    from paddlescience_tpu.arch import dgmr as dgmr_mod

    m = psci.arch.DGMR(("in",), ("out",), forecast_steps=2, input_channels=1,
                       latent_channels=64, context_channels=32,
                       num_input_frames=4, output_shape=64)
    seq = jnp.asarray(np.random.rand(1, 4, 1, 64, 64), jnp.float32)
    scales = m.conditioning_stack(seq)
    # largest spatial first: H/4 .. H/32 with channels c/8, c/4, c/2, c
    assert [s.shape for s in scales] == [
        (1, 16, 16, 4), (1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 32)]
    z = m.latent_stack(jax.random.PRNGKey(0))
    assert z.shape == (1, 2, 2, 64)
    frames = m.sampler(scales, z)
    assert frames.shape == (1, 2, 64, 64, 1)

    # spectral norm: reparameterized kernel has top singular value ~1
    conv = dgmr_mod.SNConv(8, 16, (3, 3), padding="SAME", rngs=psci.nn.Rngs(0))
    conv.weight = psci.nn.Param(3.0 * np.asarray(conv.weight))  # scale up
    k = conv._kernel().reshape(-1, 16)
    top_sv = float(jnp.linalg.svd(k, compute_uv=False)[0])
    assert abs(top_sv - 1.0) < 0.1

    # default config parameter count within 2x of the reference architecture
    big = psci.arch.DGMR(("in",), ("out",))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(big.param_tree()))
    assert 27e6 < n < 108e6  # measured 53.6M at reference defaults (768/384)


def test_extformer_moe_routing_and_aux_losses():
    """Noisy top-k MoE at reference structure (extformer_moe_utils.py:9-315,
    extformer_moe_cuboid_encoder.py:1678-1877): top-k gates renormalize,
    dense-dispatch combine equals manual expert selection, every gate style
    builds and routes, and aux (importance+load) losses appear only in
    training mode."""
    import jax
    import jax.numpy as jnp

    from paddlescience_tpu.arch.extformer_moe import (
        GatingNet, MixtureFFN, default_moe_config)
    from paddlescience_tpu import nn

    cfg = default_moe_config(num_experts=5, out_planes=2, gate_style="linear",
                             importance_weight=0.3, load_weight=0.7)
    x = jnp.asarray(np.random.rand(2, 3, 4, 4, 8), jnp.float32)
    gate = GatingNet(cfg, (3, 4, 4), 8, rngs=nn.Rngs(0))

    gates, idx, aux = gate(x)  # eval mode
    assert gates.shape == (2, 3, 4, 4, 2) and idx.shape == (2, 3, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, rtol=1e-5)
    assert float(aux) == 0.0
    # top-k indices really are the argmax experts of the softmaxed logits
    logits = jax.nn.softmax(gate._raw_logits(x), axis=-1)
    np.testing.assert_array_equal(np.asarray(idx[..., 0]), np.asarray(jnp.argmax(logits, -1)))

    _, _, aux_t = gate(x, key=jax.random.PRNGKey(0))  # train mode
    assert float(aux_t) > 0.0

    # per-style construction + routing
    for style in ("spatial-latent", "cuboid-latent", "spatial-latent-linear", "cuboid-latent-linear"):
        g = GatingNet(default_moe_config(num_experts=4, out_planes=2, gate_style=style),
                      (3, 4, 4), 8, rngs=nn.Rngs(1))
        gg, ii, _ = g(x)
        assert gg.shape == (2, 3, 4, 4, 2)

    # MixtureFFN: combine equals manual gather of per-expert outputs
    ffn = MixtureFFN(8, 16, (3, 4, 4), cfg, rngs=nn.Rngs(2))
    y, _ = ffn(x)
    assert y.shape == x.shape
    gates, idx, _ = ffn.gate(x)
    h = jax.nn.gelu(jnp.einsum("bthwd,edf->bthwef", x, ffn.w_in) + ffn.b_in)
    outs = jnp.einsum("bthwef,efd->bthwed", h, ffn.w_out) + ffn.b_out
    manual = sum(
        jnp.take_along_axis(outs, idx[..., k:k+1, None], axis=-2)[..., 0, :] * gates[..., k:k+1]
        for k in range(2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(manual), rtol=1e-5, atol=1e-6)

    # cell-style aux loss path
    cfg_cell = default_moe_config(num_experts=4, out_planes=2, aux_loss_style="cell",
                                  gate_style="linear", importance_weight=1.0, load_weight=1.0)
    g = GatingNet(cfg_cell, (3, 4, 4), 8, rngs=nn.Rngs(3))
    _, _, aux_c = g(x, key=jax.random.PRNGKey(1))
    assert np.isfinite(float(aux_c)) and float(aux_c) > 0


def test_extformer_moe_cuboid_aux_loss_output():
    """ExtFormerMoECuboid returns the summed aux_loss output in train mode
    and zero in eval (reference aggregate_aux_losses)."""
    import jax
    import jax.numpy as jnp

    from paddlescience_tpu.arch.extformer_moe import default_moe_config

    m = psci.arch.ExtFormerMoECuboid(
        ("input",), ("output",), input_shape=(4, 8, 8, 2), target_shape=(2, 8, 8, 1),
        base_units=16, num_heads=4, enc_depth=(1,), dec_depth=(1,),
        moe_config=default_moe_config(num_experts=4, out_planes=2,
                                      importance_weight=0.2, load_weight=0.2))
    x = {"input": jnp.asarray(np.random.rand(2, 4, 8, 8, 2), jnp.float32)}
    out = m(x)
    assert out["output"].shape == (2, 2, 8, 8, 1)
    assert float(out["aux_loss"][0, 0]) == 0.0
    m.set_train_rng(jax.random.PRNGKey(0))
    out_t = m(x)
    m.set_train_rng(None)
    assert float(out_t["aux_loss"][0, 0]) > 0.0


def test_cylinder_embedding_visc_conditioned_koopman():
    """CylinderEmbedding at reference structure (embedding_koopman.py:274-545):
    doctest shapes, banded (±4) viscosity-conditioned operator, cylinder mask
    zeroing, distinct operators for distinct viscosities."""
    import jax.numpy as jnp

    m = psci.arch.CylinderEmbedding(("states", "visc"),
                                    ("pred_states", "recover_states", "k_matrix"))
    x = {"states": jnp.asarray(np.random.rand(2, 4, 3, 64, 128), jnp.float32),
         "visc": jnp.asarray([[0.001], [0.01]], jnp.float32)}
    out = m(x)
    assert out["pred_states"].shape == (2, 3, 3, 64, 128)
    assert out["recover_states"].shape == (2, 4, 3, 64, 128)
    K = np.asarray(out["k_matrix"])
    assert K.shape == (2, 128, 128)
    iu = np.triu_indices(128, k=5)
    assert np.abs(K[0][iu]).max() == 0.0  # banded beyond ±4
    assert not np.allclose(K[0], K[1])  # viscosity-conditioned
    # cylinder interior (r < 1 around origin of the (-2,14)x(-4,4) grid) is 0
    X, Y = np.meshgrid(np.linspace(-2, 14, 128), np.linspace(-4, 4, 64))
    inside = np.sqrt(X**2 + Y**2) < 1
    rec = np.asarray(out["recover_states"])[0, 0, 0]
    assert np.abs(rec[inside]).max() == 0.0
