"""PDE residuals vs finite-difference oracles (reference test strategy:
test/equation/test_navier_stokes.py:10-80 recomputes residuals against a
hand-written grad oracle on a real MLP forward)."""

import jax.numpy as jnp
import numpy as np
import pytest

import paddlescience_tpu as psci
from paddlescience_tpu.utils import expression


def _eval_eq(model, eq, inp):
    import jax

    exprs = {k: psci.lambdify(v) for k, v in eq.equations.items()}
    return jax.jit(lambda d: expression.evaluate_expressions([model], d, exprs))(inp)


def _col(x, i):
    return jnp.asarray(x[:, i : i + 1])


def test_allen_cahn_residual():
    model = psci.arch.MLP(("t", "x"), ("u",), 3, 16)
    eq = psci.equation.AllenCahn(eps=0.01)
    pts = np.random.rand(12, 2).astype(np.float32)
    import jax

    inp = {"t": _col(pts, 0), "x": _col(pts, 1)}
    res = jax.jit(lambda d: expression.evaluate_expressions([model], d, eq.equations))(inp)["allen_cahn"]

    fwd = jax.jit(lambda d: model(d))

    def u(tt, xx):
        return np.asarray(fwd({"t": jnp.asarray(tt), "x": jnp.asarray(xx)})["u"])

    h = 1e-2
    t0, x0 = pts[:, 0:1], pts[:, 1:2]
    u0 = u(t0, x0)
    u_t = (u(t0 + h, x0) - u(t0 - h, x0)) / (2 * h)
    u_xx = (-u(t0, x0 + 2 * h) + 16 * u(t0, x0 + h) - 30 * u0 + 16 * u(t0, x0 - h) - u(t0, x0 - 2 * h)) / (12 * h**2)
    expected = u_t - 0.01**2 * u_xx + 5 * u0**3 - 5 * u0
    np.testing.assert_allclose(np.asarray(res), expected, atol=2e-2)


def test_laplace_residual():
    model = psci.arch.MLP(("x", "y"), ("u",), 3, 16)
    eq = psci.equation.Laplace(dim=2)
    pts = np.random.rand(10, 2).astype(np.float32)
    inp = {"x": _col(pts, 0), "y": _col(pts, 1)}
    res = _eval_eq(model, eq, inp)["laplace"]

    import jax

    # cross-check against jax.hessian (forward-over-REVERSE — a different AD
    # composition than the tape's forward-over-forward stacks): tight tol
    def pw(xv):
        return model({"x": xv[0:1], "y": xv[1:2]})["u"][0]

    H = jax.jit(jax.vmap(jax.hessian(pw)))(jnp.asarray(pts))
    lap = np.asarray(H[:, 0, 0] + H[:, 1, 1]).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(res), lap, atol=1e-4, rtol=1e-4)


def test_navier_stokes_2d_steady():
    model = psci.arch.MLP(("x", "y"), ("u", "v", "p"), 3, 16)
    nu, rho = 0.02, 1.5
    eq = psci.equation.NavierStokes(nu, rho, 2, False)
    assert set(eq.equations) == {"continuity", "momentum_x", "momentum_y"}
    pts = np.random.rand(8, 2).astype(np.float32)
    inp = {"x": _col(pts, 0), "y": _col(pts, 1)}
    res = _eval_eq(model, eq, inp)

    import jax

    fwd = jax.jit(lambda d: model(d))

    def field(key, xx, yy):
        return np.asarray(fwd({"x": jnp.asarray(xx), "y": jnp.asarray(yy)})[key])

    h = 1e-2
    x0, y0 = pts[:, 0:1], pts[:, 1:2]
    d = lambda k, i: (
        (field(k, x0 + h, y0) - field(k, x0 - h, y0)) / (2 * h)
        if i == 0
        else (field(k, x0, y0 + h) - field(k, x0, y0 - h)) / (2 * h)
    )
    cont = d("u", 0) + d("v", 1)
    np.testing.assert_allclose(np.asarray(res["continuity"]), cont, atol=1e-2)

    u0, v0 = field("u", x0, y0), field("v", x0, y0)
    def dxx_u(wrt):
        s = lambda d: (field("u", x0 + d, y0) if wrt == 0 else field("u", x0, y0 + d))
        return (-s(2 * h) + 16 * s(h) - 30 * u0 + 16 * s(-h) - s(-2 * h)) / (12 * h**2)

    lap_u = dxx_u(0) + dxx_u(1)
    mom_x = u0 * d("u", 0) + v0 * d("u", 1) - nu * lap_u + d("p", 0) / rho
    np.testing.assert_allclose(np.asarray(res["momentum_x"]), mom_x, atol=1e-1, rtol=2e-2)


def test_detach_semantics():
    """detach blocks the parameter gradient through that occurrence
    (reference test/equation/test_detach.py)."""
    import jax

    model = psci.arch.MLP(("x", "y"), ("u", "v", "p"), 2, 8)
    params = model.param_tree()
    pts = np.random.rand(6, 2).astype(np.float32)
    inp = {"x": _col(pts, 0), "y": _col(pts, 1)}

    def loss_with(detach_keys):
        eq = psci.equation.NavierStokes(0.01, 1.0, 2, False, detach_keys=detach_keys)
        exprs = {k: psci.lambdify(v) for k, v in eq.equations.items()}

        def loss(p):
            with model.bind(p):
                res = expression.evaluate_expressions([model], inp, exprs)
            return sum(jnp.sum(v**2) for v in res.values())

        return jax.jit(jax.grad(loss))(params)

    g_plain = loss_with(None)
    g_detached = loss_with(("u",))
    diff = sum(
        float(jnp.abs(a - b).sum()) for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_detached))
    )
    assert diff > 1e-6  # gradients must differ when a path is stopped


def test_vibration_learnable_params():
    eq = psci.equation.Vibration(rho=1.0, k1=-4.0, k2=0.0)
    assert set(eq.learnable_parameters) == {"k1", "k2"}
    assert "f" in eq.equations


def test_build_equation():
    eqs = psci.equation.build_equation([{"name": "Laplace", "dim": 3}])
    assert "Laplace" in eqs and eqs["Laplace"].dim == 3


def test_hooke_equation_residuals_and_learnable_E():
    """Hooke (reference examples/heart/equation.py:27-164): residuals evaluate
    under jit, traction includes the P*n load, and E=("learnable", e0)
    registers an inverse-problem parameter."""
    eq = psci.equation.Hooke(E=("learnable", 2.0), nu=0.45, P=1.064, dim=3)
    assert "E" in eq.learnable_parameters
    assert set(eq.equations) >= {"hooke_x", "hooke_y", "hooke_z",
                                 "traction_x", "traction_y", "traction_z", "traction"}
    model = psci.arch.MLP(("x", "y", "z"), ("u", "v", "w"), 2, 16)
    n = 6
    rng = np.random.default_rng(0)
    inp = {k: jnp.asarray(rng.random((n, 1), np.float32)) for k in ("x", "y", "z")}
    nrm = rng.random((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    inp.update({"normal_x": jnp.asarray(nrm[:, :1]),
                "normal_y": jnp.asarray(nrm[:, 1:2]),
                "normal_z": jnp.asarray(nrm[:, 2:3])})
    exprs = {k: psci.lambdify(v, model) for k, v in eq.equations.items()}
    out = expression.evaluate_expressions([model], inp, exprs,
                                          extra_values=dict(eq.learnable_parameters))
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # traction == traction_x*nx + traction_y*ny + traction_z*nz - P (identity)
    t_combined = np.asarray(out["traction"])
    t_from_parts = sum(
        np.asarray(out[f"traction_{c}"]) * nrm[:, i:i+1] for i, c in enumerate("xyz")
    ) - 1.064 * (nrm ** 2).sum(1, keepdims=True)
    np.testing.assert_allclose(t_combined, t_from_parts, rtol=1e-4, atol=1e-5)
