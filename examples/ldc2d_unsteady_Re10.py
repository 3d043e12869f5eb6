"""Unsteady lid-driven cavity at Re=10 (reference
``examples/ldc/ldc2d_unsteady_Re10.py``).

Time-dependent NS on TimeXGeometry([0, 1.5] x [-0.05, 0.05]^2): evenly
sampled interior collocation across 15 post-initial timestamps, four wall
BCs (moving lid on top), an evenly sampled IC at t0, sum-MSE losses with the
reference's residual down-weighting, cosine LR with 5% warmup, and a
GeometryValidator reporting interior residual MSE on fresh points.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci


def build_solver(
    epochs: int = 20000,
    iters_per_epoch: int = 1,
    output_dir: str = "./output_ldc2d_unsteady",
    nu: float = 0.01,
    rho: float = 1.0,
    ntime_all: int = 16,
    npoint_pde: int = 99**2,
    eval_batch: int = 8192,
    residual_weight: float = 1e-4,
):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("t", "x", "y"), ("u", "v", "p"), 9, 50)
    equation = {"NavierStokes": psci.equation.NavierStokes(nu, rho, 2, True)}
    timestamps = np.linspace(0.0, 1.5, ntime_all, endpoint=True).astype(np.float32)
    time_rect = psci.geometry.TimeXGeometry(
        psci.geometry.TimeDomain(0.0, 1.5, timestamps=timestamps),
        psci.geometry.Rectangle((-0.05, -0.05), (0.05, 0.05)),
    )

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    ntime = ntime_all - 1
    n_side = int(round(np.sqrt(npoint_pde))) + 2  # 99^2 interior of a 101-grid
    pde = psci.constraint.InteriorConstraint(
        equation["NavierStokes"].equations,
        {"continuity": 0, "momentum_x": 0, "momentum_y": 0},
        time_rect,
        {**cfg, "batch_size": npoint_pde * ntime},
        psci.loss.MSELoss("sum"),
        evenly=True,
        weight_dict={k: residual_weight for k in ("continuity", "momentum_x", "momentum_y")},
        name="EQ",
    )
    walls = {
        "BC_top": ({"u": 1.0, "v": 0.0}, lambda t, x, y: np.isclose(y, 0.05), (n_side + 0) * ntime),
        "BC_down": ({"u": 0.0, "v": 0.0}, lambda t, x, y: np.isclose(y, -0.05), (n_side + 0) * ntime),
        "BC_left": ({"u": 0.0, "v": 0.0}, lambda t, x, y: np.isclose(x, -0.05), (n_side - 2) * ntime),
        "BC_right": ({"u": 0.0, "v": 0.0}, lambda t, x, y: np.isclose(x, 0.05), (n_side - 2) * ntime),
    }
    constraint = {"EQ": pde}
    for name, (label, crit, bs) in walls.items():
        constraint[name] = psci.constraint.BoundaryConstraint(
            {"u": lambda out: out["u"], "v": lambda out: out["v"]},
            label, time_rect, {**cfg, "batch_size": bs},
            psci.loss.MSELoss("sum"), criteria=crit, name=name)
    constraint["IC"] = psci.constraint.InitialConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 0.0, "v": 0.0}, time_rect, {**cfg, "batch_size": npoint_pde},
        psci.loss.MSELoss("sum"), evenly=True, name="IC")

    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3,
        warmup_epoch=max(int(0.05 * epochs), 1),
    )()
    optimizer = psci.optimizer.Adam(lr)(model)

    validator = {
        "residual": psci.validate.GeometryValidator(
            equation["NavierStokes"].equations,
            {"continuity": 0, "momentum_x": 0, "momentum_y": 0},
            time_rect,
            {"dataset": "NamedArrayDataset", "total_size": npoint_pde * ntime_all,
             "batch_size": eval_batch},
            psci.loss.MSELoss("sum"),
            evenly=True,
            metric={"MSE": psci.metric.MSE()},
            with_initial=True,
            name="residual",
        )
    }
    return psci.solver.Solver(
        model, constraint, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator=validator, equation=equation, log_freq=100,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/ldc2d_unsteady_Re10.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
