"""Tests: experimental quadrature, HMC, writers, visualize, deploy, equations."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlescience_tpu as psci


def test_gaussian_integrate():
    from paddlescience_tpu.experimental import gaussian_integrate

    # int_0^1 int_0^1 x*y = 0.25
    val = gaussian_integrate(lambda p: p[:, 0] * p[:, 1], 2, 100, [[0, 1], [0, 1]])
    np.testing.assert_allclose(float(val), 0.25, rtol=1e-5)
    # int_0^pi sin = 2
    val = gaussian_integrate(lambda p: jnp.sin(p[:, 0]), 1, 64, [[0, np.pi]])
    np.testing.assert_allclose(float(val), 2.0, rtol=1e-5)


def test_trapezoid_and_mc():
    from paddlescience_tpu.experimental import montecarlo_integrate, trapezoid_integrate

    x = jnp.linspace(0, 1, 101)
    y = x**2
    np.testing.assert_allclose(float(trapezoid_integrate(y, x=x)), 1 / 3, atol=1e-3)
    cum = trapezoid_integrate(y, x=x, mode="cumsum")
    np.testing.assert_allclose(float(cum[-1]), 1 / 3, atol=1e-3)
    val = montecarlo_integrate(lambda p: jnp.ones(p.shape[0]), 2, 500, [[0, 2], [0, 3]])
    np.testing.assert_allclose(float(val), 6.0, rtol=1e-5)


def test_bessel():
    from paddlescience_tpu.experimental import bessel_i0, bessel_i1

    np.testing.assert_allclose(float(bessel_i0(jnp.asarray(0.0))), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(bessel_i1(jnp.asarray(0.0))), 0.0, atol=1e-7)


def test_hmc_gaussian():
    from paddlescience_tpu.probability import HamiltonianMonteCarlo

    def log_prob(q):
        return -0.5 * jnp.sum((q["x"] - 2.0) ** 2 / 0.5**2)

    hmc = HamiltonianMonteCarlo(log_prob, path_len=1.0, step_size=0.1)
    samples = hmc.run_chain(1500, {"x": jnp.asarray(0.0)}, seed=0)
    xs = np.asarray(samples["x"])[500:]
    assert abs(xs.mean() - 2.0) < 0.15
    assert abs(xs.std() - 0.5) < 0.15


def test_writers(tmp_path):
    from paddlescience_tpu.utils import writer

    data = {"x": np.arange(6, dtype=np.float32), "u": np.arange(6, dtype=np.float32) * 2}
    p = tmp_path / "out.csv"
    writer.save_csv_file(str(p), data, ("x", "u"))
    back = np.loadtxt(str(p), delimiter=",", skiprows=1)
    np.testing.assert_allclose(back[:, 1], data["u"])
    writer.save_tecplot_file(str(tmp_path / "out.dat"), data, ("x", "u"))
    assert (tmp_path / "out.dat").exists()


def test_vtu_and_plot(tmp_path):
    import paddlescience_tpu.visualize as vis

    n = 16
    data = {
        "x": np.random.rand(n, 1).astype(np.float32),
        "y": np.random.rand(n, 1).astype(np.float32),
        "u": np.random.rand(n, 1).astype(np.float32),
    }
    vis.save_vtu_from_dict(str(tmp_path / "pts.vtu"), data, ("x", "y"), ("u",))
    content = (tmp_path / "pts.vtu").read_text()
    assert "UnstructuredGrid" in content and 'Name="u"' in content

    v = vis.Visualizer2D({"x": data["x"], "y": data["y"]}, {"u": lambda d: d["u"]}, prefix="p")
    v.save(str(tmp_path / "plot"), data)
    assert (tmp_path / "plot.png").exists()


def test_predictor(tmp_path):
    from paddlescience_tpu.deploy import PINNPredictor

    model = psci.arch.MLP(("x",), ("u",), 2, 8)
    pred = PINNPredictor(model)
    out = pred.predict({"x": np.random.rand(50, 1).astype(np.float32)}, batch_size=16)
    assert out["u"].shape == (50, 1)
    # bf16 precision path
    pred16 = PINNPredictor(model, precision="bf16")
    out16 = pred16.predict({"x": np.random.rand(10, 1).astype(np.float32)}, batch_size=10)
    assert out16["u"].dtype == np.float32  # cast back at output


def test_volterra_quadrature():
    eq = psci.equation.Volterra(0.0, 6, 8, lambda t, s: np.exp(s - t), lambda out: out["u"])
    x = np.linspace(0.1, 2.0, 6, dtype=np.float32)
    full_x = eq.precompute(x)
    assert full_x.shape == (6 + 6 * 8, 1)
    # u = exp(-t): int_0^t e^{s-t} e^{-s} ds = t e^{-t}
    u = np.exp(-full_x)
    out = {"x": jnp.asarray(full_x), "u": jnp.asarray(u)}
    res = eq.equations["volterra"](out)
    lhs = u[:6]
    expected = lhs - (x * np.exp(-x)).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(res), expected, atol=1e-4)


def test_nlsmb_heatexchanger_build():
    eq = psci.equation.NLSMB(0.5, 1.0, 0.5, time=True)
    assert set(eq.equations) == {"Schrodinger_1", "Schrodinger_2", "Maxwell_1", "Maxwell_2", "Bloch"}
    he = psci.equation.HeatExchanger(1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    assert set(he.equations) == {"heat_boundary", "cold_boundary", "wall"}


def test_fractional_diff():
    from paddlescience_tpu.experimental import fractional_diff

    # Caputo D^0.5 of f(t)=t is 2*sqrt(t/pi)
    t = jnp.asarray([0.5, 1.0])
    got = fractional_diff(lambda s: s, 0.5, 0.0, t)
    want = 2 * np.sqrt(np.asarray(t) / np.pi)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2)


def test_fractional_poisson_discretization_converges():
    np.random.seed(0)
    import paddlescience_tpu as psci

    disk = psci.geometry.Disk((0, 0), 1.0)
    pts = disk.random_points(10) * 0.6

    def residual_norm(n_theta, n_r):
        fp = psci.equation.FractionalPoisson(alpha=1.5, geom=disk, resolution=(n_theta, n_r))
        ext = fp.precompute(pts)
        u = np.maximum(1 - np.sum(ext**2, axis=1), 0) ** (1 + 0.75)
        out = {"x": jnp.asarray(ext[:, :1]), "y": jnp.asarray(ext[:, 1:2]), "u": jnp.asarray(u[:, None])}
        return float(jnp.abs(fp.equations["fpde"](out)).mean())

    coarse = residual_norm(8, 20)
    fine = residual_norm(24, 80)
    assert fine < coarse  # GL discretization refines toward the exact solution


def test_fno1d_velocitygan_shapes():
    import paddlescience_tpu as psci

    m = psci.arch.FNO1d(modes=8, width=8, padding=10, input_channel=2, output_np=50)
    out = jax.jit(m)({"input": jnp.ones((2, 50, 2))})
    # full resampled field (reference geofno.py forward returns (B, output_np, 1))
    assert out["output"].shape == (2, 50, 1)
    vg = psci.arch.VelocityGenerator(("s",), ("v",), in_channels=3, out_size=(32, 32), dim=4)
    out = jax.jit(vg)({"s": jnp.ones((1, 3, 32, 8))})
    assert out["v"].shape == (1, 1, 32, 32)


def test_lbm_cavity():
    from paddlescience_tpu.ops import lbm

    rho, ux, uy = lbm.run_cavity(nx=32, ny=32, re=100, steps=100)
    assert np.isfinite(np.asarray(ux)).all()
    # lid drives positive ux near the top
    assert float(ux[-2].mean()) > 0.01
