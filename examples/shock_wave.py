"""PINN-WE for the 2-D compressible Euler equations (reference
``examples/shock_wave/shock_wave.py``).

Python-closure equations (not sympy) with the weighted-equation trick: each
residual is divided by lam = 1 + 0.1*relu_ramp*(|div u| - div u), which
down-weights the loss at compression shocks so the PINN can represent the
discontinuity (reference Euler2D, shock_wave.py:31-145; the reference ramps
`relu` with epoch — here the ramp factor is configured statically since the
jitted step is epoch-agnostic).

Case: Sod-type shock tube in a 2-D box, gamma=1.4. IC supervised at t=0,
Euler residuals in the interior. Reports the density jump across the
diaphragm after training.
"""

import sys

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import ad


def make_euler2d(relu_factor: float = 1.0):
    """Euler system with shock weighting (reference shock_wave.py:31-145).
    Residuals differentiate composed expressions (rho*u etc.) — exercised via
    the TapeArray composition path; abs() is the tracked builtin."""
    eq = psci.equation.PDE()

    def lam(out):
        u__x = ad.jacobian(out["u"], out["x"])
        v__y = ad.jacobian(out["v"], out["y"])
        delta = u__x + v__y
        return (0.1 * (abs(delta) - delta)) * relu_factor + 1.0

    def continuity(out):
        t, x, y = out["t"], out["x"], out["y"]
        u, v, rho = out["u"], out["v"], out["rho"]
        return (ad.jacobian(rho, t) + ad.jacobian(rho * u, x) + ad.jacobian(rho * v, y)) / lam(out)

    def x_momentum(out):
        t, x, y = out["t"], out["x"], out["y"]
        u, v, p, rho = out["u"], out["v"], out["p"], out["rho"]
        return (ad.jacobian(rho * u, t) + ad.jacobian(rho * u**2 + p, x)
                + ad.jacobian(rho * u * v, y)) / lam(out)

    def y_momentum(out):
        t, x, y = out["t"], out["x"], out["y"]
        u, v, p, rho = out["u"], out["v"], out["p"], out["rho"]
        return (ad.jacobian(rho * v, t) + ad.jacobian(rho * u * v, x)
                + ad.jacobian(rho * v**2 + p, y)) / lam(out)

    def energy(out):
        t, x, y = out["t"], out["x"], out["y"]
        u, v, p, rho = out["u"], out["v"], out["p"], out["rho"]
        ke = rho * 0.5 * (u**2 + v**2)
        return (ad.jacobian(ke + p / 0.4, t) + ad.jacobian((ke + 3.5 * p) * u, x)
                + ad.jacobian((ke + 3.5 * p) * v, y)) / lam(out)

    eq.add_equation("continuity", continuity)
    eq.add_equation("x_momentum", x_momentum)
    eq.add_equation("y_momentum", y_momentum)
    eq.add_equation("energy", energy)
    return eq


def build_solver(epochs=20, output_dir="./output_shock_wave"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("t", "x", "y"), ("u", "v", "p", "rho"), 5, 64,
                          activation="tanh")
    equation = {"Euler2D": make_euler2d()}
    geom = psci.geometry.TimeXGeometry(
        psci.geometry.TimeDomain(0.0, 0.2), psci.geometry.Rectangle((0, 0), (1, 0.25)))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 20}
    interior = psci.constraint.InteriorConstraint(
        equation["Euler2D"].equations,
        {k: 0 for k in equation["Euler2D"].equations},
        geom, {**cfg, "batch_size": 1024}, psci.loss.MSELoss("mean"), name="EQ")

    # Sod IC at t=0: left (rho=1, p=1), right (rho=0.125, p=0.1), u=v=0
    rng = np.random.default_rng(0)
    n0 = 1024
    x0 = rng.uniform(0, 1, (n0, 1)).astype(np.float32)
    y0 = rng.uniform(0, 0.25, (n0, 1)).astype(np.float32)
    t0 = np.zeros((n0, 1), np.float32)
    left = (x0 < 0.5).astype(np.float32)
    ic = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset",
                     "input": {"t": t0, "x": x0, "y": y0},
                     "label": {"u": np.zeros_like(x0), "v": np.zeros_like(x0),
                               "p": 1.0 * left + 0.1 * (1 - left),
                               "rho": 1.0 * left + 0.125 * (1 - left)},
                     "weight": {k: np.full_like(x0, 10.0)
                                for k in ("u", "v", "p", "rho")}}},
        psci.loss.MSELoss("mean"),
        {k: (lambda out, kk=k: out[kk]) for k in ("u", "v", "p", "rho")},
        name="IC")

    return psci.solver.Solver(
        model, {"EQ": interior, "IC": ic}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=20, equation=equation, log_freq=100)
def _report(solver):
    x = np.linspace(0, 1, 64, dtype=np.float32).reshape(-1, 1)
    probe = {"x": x, "y": np.full_like(x, 0.125), "t": np.zeros_like(x)}
    rho0 = solver.predict(probe, return_numpy=True)["rho"]
    print(f"shock tube: rho(left)={rho0[:16].mean():.3f} (true 1.0), "
          f"rho(right)={rho0[-16:].mean():.3f} (true 0.125)")
    return float(rho0[:16].mean())

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

    @psci.utils.config.main("conf/shock_wave.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
