"""gPINN: gradient-enhanced PINN for the 1D Poisson problem (reference
``examples/gpinn/poisson_1d.py``).

-u'' = f(x) on (0, pi) with f = 8 sin(8x) + sum_i i*sin(i x), i=1..4, plus
the gradient-enhanced residual -u''' = f'(x) weighted 0.01. Hard-constrained
boundary values via the output transform u <- x + tanh(x) tanh(pi - x) * u
(reference poisson_1d.py:69-78). The third-order derivative lowers through
the sympy compiler to a stacked forward-mode jvp chain inside the single
jitted train step.
"""

from __future__ import annotations

import numpy as np
import sympy as sp

import paddlescience_tpu as psci


class gPINN1D(psci.equation.PDE):
    """res1 = -u'' - f, res2 = -u''' - f' (reference poisson_1d.py:32-54)."""

    def __init__(self, invar: str = "x", outvar: str = "u"):
        super().__init__()
        x = self.create_symbols(invar)
        u = self.create_function(outvar, (x,))
        f = 8 * sp.sin(8 * x)
        for i in range(1, 5):
            f += i * sp.sin(i * x)
        df_x = (
            sp.cos(x)
            + 4 * sp.cos(2 * x)
            + 9 * sp.cos(3 * x)
            + 16 * sp.cos(4 * x)
            + 64 * sp.cos(8 * x)
        )
        self.add_equation("res1", -u.diff(x, 2) - f)
        self.add_equation("res2", -u.diff(x, 3) - df_x)


def u_solution(in_):
    x = in_["x"]
    sol = x + 1 / 8 * np.sin(8 * x)
    for i in range(1, 5):
        sol += 1 / i * np.sin(i * x)
    return sol


def build_solver(epochs=20000, iters_per_epoch=1, output_dir="./outputs_gpinn",
                 npoint_pde=15, npoint_eval=100, learning_rate=1e-3,
                 eval_during_train=False, eval_freq=1000):
    import jax.numpy as jnp

    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x",), ("u",), 3, 20, activation="tanh")

    def output_transform(in_, out):
        x, u = in_["x"], out["u"]
        return {"u": x + jnp.tanh(x) * jnp.tanh(np.pi - x) * u}

    model.register_output_transform(output_transform)

    equation = {"gPINN": gPINN1D("x", "u")}
    geom = {"line": psci.geometry.Interval(0, float(np.pi))}

    train_dataloader_cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    pde_constraint = psci.constraint.InteriorConstraint(
        equation["gPINN"].equations,
        {"res1": 0, "res2": 0},
        geom["line"],
        {**train_dataloader_cfg, "batch_size": npoint_pde},
        psci.loss.MSELoss("mean", weight={"res2": 0.01}),
        evenly=True,
        name="EQ",
    )
    constraint = {pde_constraint.name: pde_constraint}
    optimizer = psci.optimizer.Adam(learning_rate)(model)

    validator = {
        "L2Rel": psci.validate.GeometryValidator(
            {"u": lambda out: out["u"]},
            {"u": u_solution},
            geom["line"],
            {"dataset": "NamedArrayDataset", "total_size": npoint_eval, "batch_size": npoint_eval},
            psci.loss.MSELoss("mean"),
            evenly=True,
            metric={"L2Rel_u": psci.metric.L2Rel()},
            name="L2Rel",
        )
    }
    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        eval_during_train=eval_during_train,
        eval_freq=eval_freq,
        validator=validator,
        equation=equation,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/gpinn.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
