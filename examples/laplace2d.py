"""Laplace 2D PINN — the minimum end-to-end case (CPU-runnable, no data).

TPU-native port of reference ``examples/laplace/laplace2d.py``: MLP learns
u with Laplace(u)=0 in (0,1)^2 and u = cos(x)cosh(y) on the boundary.

Run: python examples/laplace2d.py [epochs] [mode]
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def build_solver(epochs: int = 20, iters_per_epoch: int = 1, output_dir="./output_laplace2d"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y"), ("u",), 5, 20)
    equation = {"laplace": psci.equation.Laplace(dim=2)}
    geom = {"rect": psci.geometry.Rectangle((0.0, 0.0), (1.0, 1.0))}

    def u_solution_func(out):
        x, y = out["x"], out["y"]
        return np.cos(x) * np.cosh(y)

    NPOINT_INTERIOR = 99**2
    NPOINT_BC = 400
    NPOINT_TOTAL = NPOINT_INTERIOR + NPOINT_BC
    train_dataloader_cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}

    pde_constraint = psci.constraint.InteriorConstraint(
        equation["laplace"].equations,
        {"laplace": 0},
        geom["rect"],
        {**train_dataloader_cfg, "batch_size": NPOINT_TOTAL},
        psci.loss.MSELoss("sum"),
        evenly=True,
        name="EQ",
    )
    bc = psci.constraint.BoundaryConstraint(
        {"u": lambda out: out["u"]},
        {"u": u_solution_func},
        geom["rect"],
        {**train_dataloader_cfg, "batch_size": NPOINT_BC},
        psci.loss.MSELoss("sum"),
        name="BC",
    )
    constraint = {c.name: c for c in (pde_constraint, bc)}

    optimizer = psci.optimizer.Adam(learning_rate=1e-3)(model)

    validator = {
        "MSE_Metric": psci.validate.GeometryValidator(
            {"u": lambda out: out["u"]},
            {"u": u_solution_func},
            geom["rect"],
            {"dataset": "IterableNamedArrayDataset", "total_size": NPOINT_TOTAL},
            psci.loss.MSELoss(),
            evenly=True,
            metric={"MSE": psci.metric.MSE()},
            name="MSE_Metric",
        )
    }

    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        eval_during_train=False,
        validator=validator,
        equation=equation,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/laplace2d.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
