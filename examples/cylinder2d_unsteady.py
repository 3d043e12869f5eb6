"""2-D unsteady flow around a cylinder (reference
``examples/cylinder/2d_unsteady/cylinder2d_unsteady_Re100.py``).

Time-dependent Navier-Stokes on a channel with a cylindrical hole (CSG:
rectangle minus disk), Re 100: inflow/outflow/no-slip BCs + initial
condition. The reference supervises with downloaded probe data; here the
case runs physics-only (residual + BC + IC) and validates residuals.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def build_solver(epochs=40, iters_per_epoch=50, output_dir="./output_cylinder2d"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("t", "x", "y"), ("u", "v", "p"), 5, 50)
    nu, rho = 0.02, 1.0
    equation = {"NavierStokes": psci.equation.NavierStokes(nu, rho, 2, True)}

    channel = psci.geometry.Rectangle((-4.0, -4.0), (12.0, 4.0))
    cylinder = psci.geometry.Disk((0.0, 0.0), 1.0)
    domain = channel - cylinder
    time_geom = psci.geometry.TimeXGeometry(psci.geometry.TimeDomain(0.0, 4.0), domain)

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    pde = psci.constraint.InteriorConstraint(
        equation["NavierStokes"].equations,
        {"continuity": 0, "momentum_x": 0, "momentum_y": 0},
        time_geom,
        {**cfg, "batch_size": 4096},
        psci.loss.MSELoss("mean"),
        name="EQ",
    )
    bc_inlet = psci.constraint.BoundaryConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 1.0, "v": 0.0},
        time_geom,
        {**cfg, "batch_size": 512},
        psci.loss.MSELoss("mean"),
        criteria=lambda t, x, y: np.isclose(x, -4.0),
        name="BC_inlet",
    )
    bc_cylinder = psci.constraint.BoundaryConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 0.0, "v": 0.0},
        time_geom,
        {**cfg, "batch_size": 512},
        psci.loss.MSELoss("mean"),
        criteria=lambda t, x, y: (x**2 + y**2) < 1.1**2,
        name="BC_cylinder",
    )
    ic = psci.constraint.InitialConstraint(
        {"u": lambda out: out["u"], "v": lambda out: out["v"]},
        {"u": 1.0, "v": 0.0},
        time_geom,
        {**cfg, "batch_size": 1024},
        psci.loss.MSELoss("mean"),
        name="IC",
    )
    constraint = {c.name: c for c in (pde, bc_inlet, bc_cylinder, ic)}

    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3, warmup_epoch=max(epochs // 20, 1)
    )()
    validator = {
        "residual": psci.validate.GeometryValidator(
            equation["NavierStokes"].equations,
            {"continuity": 0, "momentum_x": 0, "momentum_y": 0},
            time_geom,
            {"dataset": "IterableNamedArrayDataset", "total_size": 4096},
            psci.loss.MSELoss("mean"),
            metric={"MSE": psci.metric.MSE()},
            name="residual",
        )
    }
    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        validator=validator,
        equation=equation,
        log_freq=200,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/cylinder2d_unsteady.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
