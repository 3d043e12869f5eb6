"""Parity tests for the fused Taylor-jet derivative path (autodiff/jet.py).

The jet forward must agree with the generic nested-jvp derivative stacks
(autodiff/ad.py) on every MLP-family arch, for orders 0..2 including mixed
partials — and the end-to-end expression evaluation (which auto-selects the
jet path via the eval_shape collection pass) must be bit-consistent with the
fallback path, both in values and in parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlescience_tpu.arch.mlp import MLP, ModifiedMLP, PirateNet
from paddlescience_tpu.autodiff import ad, jet
from paddlescience_tpu.nn.core import Param, Rngs
from paddlescience_tpu.utils import expression


def _nested_jvp_component(pointwise, x, dmulti):
    """Reference implementation: vmapped nested jvp along basis directions."""
    d = x.shape[-1]

    def kth(xvec):
        g = pointwise
        for j in dmulti:
            t = jnp.zeros((d,)).at[j].set(1.0)
            g = (lambda g_, t_: lambda v: jax.jvp(g_, (v,), (t_,))[1])(g, t)
        return g(xvec)

    return jax.vmap(kth)(x)


def _model_pointwise(model):
    keys = tuple(model.input_keys)

    def pw(xvec):
        feed = {k: xvec[i : i + 1] for i, k in enumerate(keys)}
        o = model(feed)
        return jnp.concatenate([o[k] for k in model.output_keys], axis=-1)

    return pw


COMPONENTS = [(0,), (1,), (0, 0), (0, 1), (1, 1)]


def _check_model_jet(model, n=16, d=2, tol=2e-4):
    x = jax.random.normal(jax.random.PRNGKey(3), (n, d)) * 0.7
    idx = jet.build_index(COMPONENTS)
    jout = model.forward_jet(jet.seed(x, idx))
    pw = _model_pointwise(model)
    np.testing.assert_allclose(
        jout.primal, jax.vmap(pw)(x), rtol=tol, atol=tol, err_msg="primal"
    )
    for m in COMPONENTS:
        ref = _nested_jvp_component(pw, x, m)
        got = jout.component(m)
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol, err_msg=f"component {m}")


def test_jet_mlp_tanh():
    _check_model_jet(MLP(("t", "x"), ("u",), 3, 32, rngs=Rngs(0)))


def test_jet_mlp_fourier_rwf():
    _check_model_jet(
        MLP(
            ("t", "x"),
            ("u", "v"),
            2,
            24,
            fourier={"dim": 16, "scale": 1.5},
            random_weight={"mean": 0.5, "std": 0.1},
            rngs=Rngs(1),
        )
    )

def test_jet_mlp_periods_weightnorm_skip():
    _check_model_jet(
        MLP(
            ("t", "x"),
            ("u",),
            4,
            16,
            periods={"x": (2.0, False)},
            weight_norm=True,
            skip_connection=True,
            rngs=Rngs(2),
        )
    )


@pytest.mark.parametrize("act", ["tanh", "sin", "swish", "stan", "gelu", "sigmoid"])
def test_jet_mlp_activations(act):
    _check_model_jet(MLP(("t", "x"), ("u",), 2, 16, activation=act, rngs=Rngs(4)))


def test_jet_modified_mlp():
    _check_model_jet(ModifiedMLP(("t", "x"), ("u",), 3, 24, rngs=Rngs(5)))


def test_jet_piratenet():
    m = PirateNet(
        ("t", "x"),
        ("u",),
        num_blocks=2,
        hidden_size=24,
        fourier={"dim": 24, "scale": 2.0},
        random_weight={"mean": 0.5, "std": 0.1},
        rngs=Rngs(6),
    )
    # PirateNet alpha init is 0 -> blocks are near-identity; nudge alpha so the
    # residual path is actually exercised
    for b in m.blocks:
        b.alpha = Param(jnp.asarray([0.3]))
    _check_model_jet(m)


def test_jet_index_closure_and_errors():
    idx = jet.build_index([(1, 1), (0,)])
    assert idx.multis == ((), (0,), (1,), (1, 1))
    with pytest.raises(ValueError):
        jet.build_index([(0, 0, 0)])
    with pytest.raises(ValueError):
        jet.JetIndex([(0,)])  # must start with primal


def test_jet_mul_second_order():
    # product rule check: h = f*g with f = x0^2, g = sin(x1) on 1 point batch
    idx = jet.build_index(COMPONENTS)
    x = jnp.array([[0.7, -0.3]])
    jx = jet.seed(x, idx)
    x0, x1 = jet.split(jx, [1, 1])
    f = jet.mul(x0, x0)
    g = jet.elementwise(x1, jnp.sin)
    h = jet.mul(f, g)
    a, b = 0.7, -0.3
    np.testing.assert_allclose(h.primal[0, 0], a * a * np.sin(b), rtol=1e-5)
    np.testing.assert_allclose(h.component((0,))[0, 0], 2 * a * np.sin(b), rtol=1e-5)
    np.testing.assert_allclose(h.component((1,))[0, 0], a * a * np.cos(b), rtol=1e-5)
    np.testing.assert_allclose(h.component((0, 0))[0, 0], 2 * np.sin(b), rtol=1e-5)
    np.testing.assert_allclose(h.component((0, 1))[0, 0], 2 * a * np.cos(b), rtol=1e-5)
    np.testing.assert_allclose(h.component((1, 1))[0, 0], -a * a * np.sin(b), rtol=1e-5)


def _residual_loss(model, input_dict):
    """Allen-Cahn-style residual through the full expression evaluator."""
    exprs = {
        "res": lambda out: ad.jacobian(out["u"], out["t"])
        - 0.0001 * ad.hessian(out["u"], out["x"])
        + 5.0 * out["u"] ** 3
        - 5.0 * out["u"]
    }
    r = expression.evaluate_expressions([model], input_dict, exprs)
    return jnp.mean(r["res"] ** 2)


def test_jet_end_to_end_matches_fallback():
    model = PirateNet(
        ("t", "x"),
        ("u",),
        num_blocks=2,
        hidden_size=16,
        fourier={"dim": 16, "scale": 2.0},
        rngs=Rngs(7),
    )
    for b in model.blocks:
        b.alpha = Param(jnp.asarray([0.25]))
    n = 32
    key = jax.random.PRNGKey(9)
    input_dict = {
        "t": jax.random.uniform(key, (n, 1)),
        "x": jax.random.uniform(jax.random.fold_in(key, 1), (n, 1)) * 2 - 1,
    }

    from jax.flatten_util import ravel_pytree

    from paddlescience_tpu.nn import core as nn_core

    _, params, buffers = nn_core.split(model)

    def loss_fn(p):
        return nn_core.merge_call(
            model, p, buffers, lambda m: _residual_loss(m, input_dict)
        )

    val_jet, grad_jet = jax.value_and_grad(loss_fn)(params)

    # force the fallback path by disabling jet support
    orig = type(model).supports_jet
    try:
        type(model).supports_jet = lambda self: False
        val_ref, grad_ref = jax.value_and_grad(loss_fn)(params)
    finally:
        type(model).supports_jet = orig

    np.testing.assert_allclose(val_jet, val_ref, rtol=1e-5, atol=1e-6)
    flat_j, _ = ravel_pytree(grad_jet)
    flat_r, _ = ravel_pytree(grad_ref)
    np.testing.assert_allclose(flat_j, flat_r, rtol=5e-4, atol=1e-5)
