"""Lid-driven cavity steady Navier-Stokes PINN
(reference ``examples/ldc/ldc2d_steady_Re10.py``).

Multi-equation residuals (continuity + momentum) over a square cavity with a
moving lid; validates against zero-residual interior losses (the reference
validates vs downloaded reference data; here eval reports momentum residual
norms, and the lid/noslip BCs pin the solution).
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def build_solver(epochs=50, iters_per_epoch=50, re=10.0, output_dir="./output_ldc2d", lbfgs=False):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y"), ("u", "v", "p"), 4, 50)
    nu = 1.0 / re  # lid speed 1, L=1
    equation = {"NavierStokes": psci.equation.NavierStokes(nu, 1.0, 2, False)}
    geom = {"rect": psci.geometry.Rectangle((-0.05, -0.05), (0.05, 0.05))}

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    pde = psci.constraint.InteriorConstraint(
        equation["NavierStokes"].equations,
        {"continuity": 0, "momentum_x": 0, "momentum_y": 0},
        geom["rect"],
        {**cfg, "batch_size": 2048},
        psci.loss.MSELoss("sum"),
        evenly=True,
        weight_dict={"continuity": 1e-4, "momentum_x": 1e-4, "momentum_y": 1e-4},
        name="EQ",
    )
    bc_top = psci.constraint.BoundaryConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 1.0, "v": 0.0},
        geom["rect"],
        {**cfg, "batch_size": 256},
        psci.loss.MSELoss("sum"),
        criteria=lambda x, y: np.isclose(y, 0.05),
        name="BC_top",
    )
    bc_rest = psci.constraint.BoundaryConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 0.0, "v": 0.0},
        geom["rect"],
        {**cfg, "batch_size": 768},
        psci.loss.MSELoss("sum"),
        criteria=lambda x, y: ~np.isclose(y, 0.05),
        name="BC_rest",
    )
    constraint = {c.name: c for c in (pde, bc_top, bc_rest)}

    if lbfgs:
        optimizer = psci.optimizer.LBFGS(max_iter=10)(model)
    else:
        lr = psci.optimizer.lr_scheduler.Cosine(
            epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3, warmup_epoch=max(epochs // 20, 1)
        )()
        optimizer = psci.optimizer.Adam(lr)(model)

    # residual validator: momentum residuals should vanish on fresh points
    validator = {
        "residual": psci.validate.GeometryValidator(
            equation["NavierStokes"].equations,
            {"continuity": 0, "momentum_x": 0, "momentum_y": 0},
            geom["rect"],
            {"dataset": "IterableNamedArrayDataset", "total_size": 2048},
            psci.loss.MSELoss("sum"),
            metric={"MSE": psci.metric.MSE()},
            name="residual",
        )
    }

    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        validator=validator,
        equation=equation,
        log_freq=100,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/ldc2d_steady.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
