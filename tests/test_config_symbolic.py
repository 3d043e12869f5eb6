"""Config layer + sympy lowering tests (reference test/utils/test_config.py,
test_symbolic.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp

import paddlescience_tpu as psci
from paddlescience_tpu.utils import config as config_mod
from paddlescience_tpu.utils.symbolic import _cvt_to_key


def test_yaml_interpolation_and_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
mode: train
seed: 42
TRAIN:
  epochs: 10
  iters_per_epoch: 100
  lr_scheduler:
    epochs: ${TRAIN.epochs}
    learning_rate: 1.0e-3
PI: ${numpy:pi}
TOTAL: ${sum:[1, 2, 3]}
"""
    )
    cfg = config_mod.load_config(str(p), overrides=["TRAIN.epochs=20", "seed=7"])
    assert cfg.TRAIN.epochs == 20
    assert cfg.TRAIN.lr_scheduler.epochs == 20  # interpolation after override
    assert abs(cfg.PI - np.pi) < 1e-9
    assert cfg.TOTAL == 6
    assert cfg.seed == 7


def test_config_validation(tmp_path):
    bad = config_mod.Config.wrap({"mode": "train", "seed": 42, "TRAIN": {"epochs": 0}})
    with pytest.raises(Exception):
        config_mod.validate_config(bad)
    ok = config_mod.Config.wrap({"mode": "train", "seed": 42, "TRAIN": {"epochs": 5}})
    config_mod.validate_config(ok)


def test_cvt_to_key():
    x, y = sp.symbols("x y")
    u = sp.Function("u")(x, y)
    assert _cvt_to_key(u) == "u"
    assert _cvt_to_key(sp.Derivative(u, (x, 2), (y, 1))) == "u__x__x__y"
    assert _cvt_to_key(x) == "x"


def test_lambdify_operators():
    x, y = sp.symbols("x y")
    expr = sp.sin(x) * sp.cos(y) + sp.exp(x) / (1 + y**2) + sp.Max(x, y) + sp.Heaviside(x - 0.5)
    fn = psci.lambdify(expr)
    out = {"x": jnp.asarray([[0.3], [0.9]]), "y": jnp.asarray([[0.1], [0.2]])}
    got = np.asarray(jax.jit(fn)(out)).flatten()
    xs, ys = np.array([0.3, 0.9]), np.array([0.1, 0.2])
    want = np.sin(xs) * np.cos(ys) + np.exp(xs) / (1 + ys**2) + np.maximum(xs, ys) + (xs > 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lambdify_pow_expansion():
    x = sp.Symbol("x")
    fn = psci.lambdify(x**3 + x**-1 + sp.sqrt(x))
    out = {"x": jnp.asarray([[4.0]])}
    np.testing.assert_allclose(float(fn(out)[0, 0]), 64 + 0.25 + 2.0, rtol=1e-6)


def test_lambdify_piecewise():
    x = sp.Symbol("x")
    expr = sp.Piecewise((x**2, x < 0.5), (x, True))
    fn = psci.lambdify(expr)
    out = {"x": jnp.asarray([[0.2], [0.8]])}
    np.testing.assert_allclose(np.asarray(fn(out)).flatten(), [0.04, 0.8], rtol=1e-5)


def test_lambdify_passthrough_callable():
    f = lambda out: out["x"] * 2
    assert psci.lambdify(f) is f


def test_lambdify_list():
    x = sp.Symbol("x")
    fns = psci.lambdify([x, x * 2])
    out = {"x": jnp.asarray([[3.0]])}
    assert float(fns[1](out)[0, 0]) == 6.0
