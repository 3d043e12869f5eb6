"""Autodiff tape vs finite differences (SURVEY.md §4: the reference tests
equations against a hand-written grad oracle; we use central differences)."""

import jax
import jax.numpy as jnp
import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import ad
from paddlescience_tpu.utils import expression


def _fd(f, x, i, h=1e-2):
    xp, xm = x.copy(), x.copy()
    xp[:, i] += h
    xm[:, i] -= h
    return (f(xp) - f(xm)) / (2 * h)


def _fd2(f, x, i, h=1e-2):
    """five-point stencil: O(h^4) truncation, f32-safe at h=1e-2."""
    def shift(d):
        xs = x.copy()
        xs[:, i] += d
        return f(xs)
    return (-shift(2 * h) + 16 * shift(h) - 30 * f(x) + 16 * shift(-h) - shift(-2 * h)) / (12 * h**2)


def _setup(n=16):
    model = psci.arch.MLP(("x", "y"), ("u", "v"), 3, 16)
    x = np.random.rand(n, 2).astype(np.float32)
    inp = {"x": jnp.asarray(x[:, 0:1]), "y": jnp.asarray(x[:, 1:2])}

    fwd = jax.jit(lambda d: model(d))

    def f_np(key):
        def f(xx):
            out = fwd({"x": jnp.asarray(xx[:, 0:1]), "y": jnp.asarray(xx[:, 1:2])})
            return np.asarray(out[key])

        return f

    return model, x, inp, f_np


def _tape_eval(model, inp, names):
    """jit a tape evaluation producing the named derivative arrays."""

    @jax.jit
    def run(inp):
        with ad.tape_context() as tape:
            out = expression.forward_with_derivatives([model], inp, tape)
            results = {}
            for name in names:
                key, *path = name.split("__")
                val = out[key]
                for coord in path:
                    val = ad.jacobian(val, out[coord])
                results[name] = val
        return results

    return run(inp)


def test_jacobian_matches_fd():
    model, x, inp, f_np = _setup()
    res = _tape_eval(model, inp, ["u__x", "v__y"])
    np.testing.assert_allclose(np.asarray(res["u__x"]), _fd(f_np("u"), x, 0), atol=1e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(res["v__y"]), _fd(f_np("v"), x, 1), atol=1e-2, rtol=2e-2)


def test_jacobian_multi_input_form():
    model, x, inp, f_np = _setup(8)

    @jax.jit
    def run(inp):
        with ad.tape_context() as tape:
            out = expression.forward_with_derivatives([model], inp, tape)
            u_x, u_y = ad.jacobian(out["u"], [out["x"], out["y"]])
        return u_x, u_y

    u_x, u_y = run(inp)
    np.testing.assert_allclose(np.asarray(u_x), _fd(f_np("u"), x[:8], 0), atol=1e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(u_y), _fd(f_np("u"), x[:8], 1), atol=1e-2, rtol=2e-2)


def test_hessian_matches_fd():
    model, x, inp, f_np = _setup(8)

    @jax.jit
    def run(inp):
        with ad.tape_context() as tape:
            out = expression.forward_with_derivatives([model], inp, tape)
            return ad.hessian(out["u"], out["x"]), ad.hessian(out["u"], out["y"])

    u_xx, u_yy = run(inp)

    # cross-check against jax.hessian (forward-over-reverse) — tight tol
    def pw(xv):
        return model({"x": xv[0:1], "y": xv[1:2]})["u"][0]

    H = jax.jit(jax.vmap(jax.hessian(pw)))(x[:8])
    np.testing.assert_allclose(np.asarray(u_xx).flatten(), np.asarray(H[:, 0, 0]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u_yy).flatten(), np.asarray(H[:, 1, 1]), atol=1e-4, rtol=1e-4)


def test_third_order_by_chaining():
    model, x, inp, f_np = _setup(8)
    res = _tape_eval(model, inp, ["u__x__x__y"])
    u_xxy = res["u__x__x__y"]
    assert u_xxy.shape == (8, 1)
    assert np.isfinite(np.asarray(u_xxy)).all()


def test_jacobian_caching_same_array():
    model, x, inp, _ = _setup(4)

    @jax.jit
    def run(inp):
        with ad.tape_context() as tape:
            out = expression.forward_with_derivatives([model], inp, tape)
            a = ad.jacobian(out["u"], out["x"])
            b = ad.jacobian(out["u"], out["x"])
        return a, b

    a, b = run(inp)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_clear_and_errors():
    with ad.tape_context():
        ad.clear()  # no-op on fresh tape
    try:
        ad.jacobian(jnp.ones((4, 1)), jnp.ones((4, 1)))
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass


def test_functional_api():
    f = lambda v: jnp.stack([v[0] ** 2 * v[1], jnp.sin(v[1])])
    x = jnp.asarray(np.random.rand(5, 2).astype(np.float32))
    J = ad.jacobian_fn(f)(x)
    np.testing.assert_allclose(np.asarray(J[:, 0, 0]), np.asarray(2 * x[:, 0] * x[:, 1]), rtol=1e-5)
    H = ad.hessian_fn(f)(x)
    np.testing.assert_allclose(np.asarray(H[:, 0, 0, 0]), np.asarray(2 * x[:, 1]), rtol=1e-5)


def test_hessian_rejects_unregistered_xs():
    # regression: hessian() silently fell back to i=j=0 when xs was not a
    # registered input coordinate
    import pytest

    model = psci.arch.MLP(("x", "y"), ("u",), 2, 8)
    inp = {"x": jnp.linspace(0.0, 1.0, 8).reshape(-1, 1),
           "y": jnp.zeros((8, 1))}
    bogus = jnp.ones((8, 1))

    with ad.tape_context() as tape:
        out = expression.forward_with_derivatives([model], inp, tape)
        with pytest.raises(ValueError, match="not a registered"):
            ad.hessian(out["u"], bogus)
        h = ad.hessian(out["u"], out["x"])  # registered coord still works
    assert h.shape == (8, 1)


def test_composed_expression_jacobian():
    """TapeArray path: jacobian of composed expressions like d(rho*u)/dx
    (reference supports this via paddle.grad's dynamic graph)."""
    model = psci.arch.MLP(("x", "y"), ("u", "rho"), 2, 12)
    n = 8
    xv = np.random.rand(n, 2).astype(np.float32)
    inp = {"x": jnp.asarray(xv[:, :1]), "y": jnp.asarray(xv[:, 1:])}

    def residual(out):
        # d(rho*u)/dx  must equal  rho*du/dx + u*drho/dx (product rule)
        lhs = ad.jacobian(out["rho"] * out["u"], out["x"])
        rhs = out["rho"] * ad.jacobian(out["u"], out["x"]) + out["u"] * ad.jacobian(out["rho"], out["x"])
        return lhs, rhs

    res = expression.evaluate_expressions([model], inp, {"pair": residual})
    lhs, rhs = res["pair"]
    np.testing.assert_allclose(np.asarray(ad.unwrap(lhs)), np.asarray(ad.unwrap(rhs)), rtol=2e-5, atol=2e-6)


def test_composed_second_derivative_and_weighting():
    """Second derivative of a composition + division by a tracked weight."""
    model = psci.arch.MLP(("x",), ("u",), 2, 12)
    x = jnp.asarray(np.linspace(0.1, 1.0, 8, dtype=np.float32).reshape(-1, 1))

    def resid(out):
        u, xx = out["u"], out["x"]
        # d2(u^2)/dx2 = 2*u*u_xx + 2*u_x^2
        lhs = ad.jacobian(ad.jacobian(u * u, xx), xx)
        u_x = ad.jacobian(u, xx)
        u_xx = ad.jacobian(u_x, xx)
        rhs = 2.0 * u * u_xx + 2.0 * u_x * u_x
        lam = abs(u_x) + 1.0  # tracked weighting like PINN-WE
        return ad.unwrap(lhs / lam), ad.unwrap(rhs / lam)

    res = expression.evaluate_expressions([model], {"x": x}, {"pair": resid})
    lhs, rhs = res["pair"]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=2e-4, atol=2e-5)


def test_coord_times_output_jacobian():
    """d(x*u)/dx = u + x*u_x (coords are tracked in single-stack constraints)."""
    model = psci.arch.MLP(("x", "y"), ("u",), 2, 12)
    n = 8
    xv = np.random.rand(n, 2).astype(np.float32) + 0.1
    inp = {"x": jnp.asarray(xv[:, :1]), "y": jnp.asarray(xv[:, 1:])}

    def resid(out):
        lhs = ad.jacobian(out["x"] * out["u"], out["x"])
        rhs = out["u"] + out["x"] * ad.jacobian(out["u"], out["x"])
        return ad.unwrap(lhs), ad.unwrap(rhs)

    res = expression.evaluate_expressions([model], inp, {"pair": resid})
    lhs, rhs = res["pair"]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=2e-5, atol=2e-6)


def test_output_transform_with_jacobian_stream_function():
    """Output transforms may call jacobian/hessian (reference bubble.py:96-104
    stream-function transform): u = dpsi/dy, v = -dpsi/dx must satisfy
    div u = 0 identically, and downstream equations can differentiate the
    transformed outputs again (pressure Poisson on p)."""
    model = psci.arch.MLP(("x", "y"), ("psi", "p_raw"), 2, 12)

    def transform_out(in_, out):
        return {
            "u": ad.jacobian(out["psi"], in_["y"]),
            "v": -ad.jacobian(out["psi"], in_["x"]),
            "p": out["p_raw"],
        }

    model.register_output_transform(transform_out)
    n = 8
    inp = {
        "x": jnp.asarray(np.random.rand(n, 1).astype(np.float32)),
        "y": jnp.asarray(np.random.rand(n, 1).astype(np.float32)),
    }

    def exprs(out):
        div = ad.jacobian(out["u"], out["x"]) + ad.jacobian(out["v"], out["y"])
        pp = ad.jacobian(ad.jacobian(out["p"], out["x"]), out["x"])
        return ad.unwrap(div), ad.unwrap(pp)

    res = expression.evaluate_expressions([model], inp, {"pair": exprs})
    div, pp = res["pair"]
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(pp)).all()
    # second derivative of p must match a finite-difference of dp/dx
    h = 1e-3

    def p_of_x(xval):
        out = expression.evaluate_expressions(
            [model], {"x": jnp.full((n, 1), xval, jnp.float32), "y": inp["y"]},
            {"px": lambda o: ad.unwrap(ad.jacobian(o["p"], o["x"]))})
        return np.asarray(out["px"])

    fd = (p_of_x(0.5 + h) - p_of_x(0.5 - h)) / (2 * h)
    out_c = expression.evaluate_expressions(
        [model], {"x": jnp.full((n, 1), 0.5, jnp.float32), "y": inp["y"]},
        {"pxx": lambda o: ad.unwrap(ad.jacobian(ad.jacobian(o["p"], o["x"]), o["x"]))})
    np.testing.assert_allclose(np.asarray(out_c["pxx"]), fd, rtol=5e-3, atol=5e-4)
