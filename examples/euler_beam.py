"""Euler beam 1-D biharmonic PINN (reference ``examples/euler_beam/euler_beam.py``).

u'''' + 1 = 0 on (0,1) with u(0)=u'(0)=0, u''(1)=u'''(1)=0;
analytic solution u = -x^4/24 + x^3/6 - x^2/4.
"""

import sys

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import hessian, jacobian


def build_solver(epochs=100, iters_per_epoch=10, output_dir="./output_euler_beam"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x",), ("u",), 3, 20)
    geom = {"interval": psci.geometry.Interval(0, 1)}
    equation = {"biharmonic": psci.equation.Biharmonic(dim=1, q=-1.0, D=1.0)}

    dataloader_cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    pde_constraint = psci.constraint.InteriorConstraint(
        equation["biharmonic"].equations,
        {"biharmonic": 0},
        geom["interval"],
        {**dataloader_cfg, "batch_size": 100},
        psci.loss.MSELoss(),
        random="Hammersley",
        name="EQ",
    )
    bc = psci.constraint.BoundaryConstraint(
        {
            "u0": lambda d: d["u"][0:1],
            "u__x": lambda d: jacobian(d["u"], d["x"])[1:2],
            "u__x__x": lambda d: hessian(d["u"], d["x"])[2:3],
            "u__x__x__x": lambda d: jacobian(hessian(d["u"], d["x"]), d["x"])[3:4],
        },
        {"u0": 0, "u__x": 0, "u__x__x": 0, "u__x__x__x": 0},
        geom["interval"],
        {**dataloader_cfg, "batch_size": 4},
        psci.loss.MSELoss("sum"),
        evenly=True,
        name="BC",
    )
    constraint = {c.name: c for c in (pde_constraint, bc)}
    optimizer = psci.optimizer.Adam(1e-3)(model)

    def u_solution_func(out):
        x = out["x"]
        return -(x**4) / 24 + x**3 / 6 - x**2 / 4

    validator = {
        "L2Rel_Metric": psci.validate.GeometryValidator(
            {"u": lambda out: out["u"]},
            {"u": u_solution_func},
            geom["interval"],
            {"dataset": "IterableNamedArrayDataset", "total_size": 100},
            psci.loss.MSELoss(),
            evenly=True,
            metric={"L2Rel": psci.metric.L2Rel()},
            name="L2Rel_Metric",
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

    @psci.utils.config.main("conf/euler_beam.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
