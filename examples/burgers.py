"""1-D viscous Burgers PINN (the canonical PINN benchmark; reference
covers it inside ``examples/xpinn`` and the phycrnet/deephpms cases).

u_t + u u_x = nu u_xx on (t, x) in [0,1] x [-1,1], u(0,x) = -sin(pi x),
u(t,±1) = 0, nu = 0.01/pi. The composed advection term u*u_x exercises the
TapeArray product path inside a sympy-free closure equation. Validated
against a Cole-Hopf/spectral reference computed on the fly.
"""

import sys

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import ad

NU = 0.01 / np.pi


def solve_burgers_spectral(nx=256, nt=101, t_max=1.0):
    """Fourier pseudo-spectral reference solution with RK4 in time."""
    x = np.linspace(-1, 1, nx, endpoint=False)
    k = np.fft.fftfreq(nx, d=2.0 / nx) * 2 * np.pi / 2.0 * 2  # wavenumbers on [-1,1)
    u = -np.sin(np.pi * x)
    dt = t_max / (nt - 1) / 20
    us = [u.copy()]

    def rhs(u):
        uh = np.fft.fft(u)
        ux = np.real(np.fft.ifft(1j * k * uh))
        uxx = np.real(np.fft.ifft(-(k**2) * uh))
        return -u * ux + NU * uxx

    t_save = np.linspace(0, t_max, nt)
    t = 0.0
    for i in range(1, nt):
        while t < t_save[i] - 1e-12:
            k1 = rhs(u)
            k2 = rhs(u + 0.5 * dt * k1)
            k3 = rhs(u + 0.5 * dt * k2)
            k4 = rhs(u + dt * k3)
            u = u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            t += dt
        us.append(u.copy())
    return t_save, x, np.stack(us)  # (nt, nx)


def build_solver(epochs=40, output_dir="./output_burgers"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("t", "x"), ("u",), 4, 64)

    def burgers_residual(out):
        u, t, x = out["u"], out["t"], out["x"]
        return ad.jacobian(u, t) + u * ad.jacobian(u, x) - NU * ad.hessian(u, x)

    eq = psci.equation.PDE()
    eq.add_equation("burgers", burgers_residual)
    geom = psci.geometry.TimeXGeometry(
        psci.geometry.TimeDomain(0.0, 1.0), psci.geometry.Interval(-1.0, 1.0))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 50}
    interior = psci.constraint.InteriorConstraint(
        eq.equations, {"burgers": 0}, geom, {**cfg, "batch_size": 2048},
        psci.loss.MSELoss("mean"), name="EQ")
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (512, 1)).astype(np.float32)
    ic = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset",
                     "input": {"t": np.zeros_like(x0), "x": x0},
                     "label": {"u": -np.sin(np.pi * x0)}}},
        psci.loss.MSELoss("mean"), {"u": lambda out: out["u"]}, name="IC")
    tb = rng.uniform(0, 1, (256, 1)).astype(np.float32)
    xb = np.where(rng.random((256, 1)) < 0.5, -1.0, 1.0).astype(np.float32)
    bc = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset",
                     "input": {"t": tb, "x": xb},
                     "label": {"u": np.zeros_like(tb)}}},
        psci.loss.MSELoss("mean"), {"u": lambda out: out["u"]}, name="BC")

    return psci.solver.Solver(
        model, {"EQ": interior, "IC": ic, "BC": bc}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=50, equation={"burgers": eq}, log_freq=500)
def _report(solver):
    t_ref, x_ref, u_ref = solve_burgers_spectral()
    T, X = np.meshgrid(t_ref, x_ref, indexing="ij")
    pred = solver.predict({"t": T.reshape(-1, 1).astype(np.float32),
                           "x": X.reshape(-1, 1).astype(np.float32)}, return_numpy=True)["u"]
    l2 = float(np.linalg.norm(pred.ravel() - u_ref.ravel()) / np.linalg.norm(u_ref))
    print(f"Burgers L2Rel vs spectral reference: {l2:.4f}")
    return l2

def main_cli():
    import paddlescience_tpu as psci

    import _runner

    def _build(cfg):
        return _runner.build_from_cfg(cfg, build_solver)

    def _train(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        solver.train()
        return _report(solver)

    def _evaluate(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        path = cfg.get_path("EVAL.pretrained_model_path")
        if path:
            solver.load_pretrain(path)
        return _report(solver)

    @psci.utils.config.main("conf/burgers.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
