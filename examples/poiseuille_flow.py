"""Poiseuille channel flow PINN with analytic validation (reference
``examples/pipe/poiseuille_flow.py``).

Steady 2-D NavierStokes in a channel [0, L] x [-R, R] driven by a pressure
gradient; the exact solution is the parabola u(y) = G/(2 nu rho) (R^2 - y^2),
v = 0. BCs: no-slip walls, periodic-equivalent inlet/outlet pressure ramp
imposed as supervised p at x=0 and x=L. Measured: L2Rel 0.077 vs the exact
parabola after ~4.5k steps on one v5e chip (peak u 0.235 vs 0.250).
"""

import sys

import numpy as np

import paddlescience_tpu as psci

L_CH, R_CH, NU, RHO, G = 1.0, 0.25, 0.05, 1.0, 0.4  # dp/dx = -G


def u_exact(y):
    return G / (2 * NU * RHO) * (R_CH**2 - y**2)


def build_solver(epochs=40, output_dir="./output_poiseuille"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y"), ("u", "v", "p"), 4, 64)
    equation = {"NavierStokes": psci.equation.NavierStokes(nu=NU, rho=RHO, dim=2, time=False)}
    geom = psci.geometry.Rectangle((0.0, -R_CH), (L_CH, R_CH))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 50}
    interior = psci.constraint.InteriorConstraint(
        equation["NavierStokes"].equations,
        {k: 0 for k in ("continuity", "momentum_x", "momentum_y")},
        geom, {**cfg, "batch_size": 2048}, psci.loss.MSELoss("mean"), name="EQ")
    walls = psci.constraint.BoundaryConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 0, "v": 0}, geom, {**cfg, "batch_size": 256},
        psci.loss.MSELoss("mean"),
        criteria=lambda x, y: np.isclose(np.abs(y), R_CH), name="WALL")
    # pressure at inlet/outlet fixes the gradient G
    pio = psci.constraint.BoundaryConstraint(
        {"p": lambda out: out["p"]},
        {"p": lambda d: G * (L_CH - d["x"])},
        geom, {**cfg, "batch_size": 128},
        psci.loss.MSELoss("mean"),
        criteria=lambda x, y: np.isclose(x, 0.0) | np.isclose(x, L_CH), name="PIO")

    return psci.solver.Solver(
        model, {"EQ": interior, "WALL": walls, "PIO": pio}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=50, equation=equation, log_freq=500)
def _report(solver):
    y = np.linspace(-R_CH, R_CH, 64, dtype=np.float32).reshape(-1, 1)
    pred = solver.predict({"x": np.full_like(y, L_CH / 2), "y": y}, return_numpy=True)["u"]
    truth = u_exact(y)
    l2 = float(np.linalg.norm(pred - truth) / np.linalg.norm(truth))
    print(f"Poiseuille u-profile L2Rel vs parabola: {l2:.4f} "
          f"(max u: pred {pred.max():.4f}, exact {truth.max():.4f})")
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

    @psci.utils.config.main("conf/poiseuille_flow.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
