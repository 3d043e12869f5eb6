"""Volterra integral-differential equation (reference ``examples/ide/volterra_ide.py``).

u'(t) = u(t) + int_0^t K(t,s) u(s) ds with K = exp(s - t), u(0) = 1;
exact solution u = exp(t) cosh(t)... (reference case: dy/dx + y = int_0^x
e^{t-x} y(t) dt with y(0)=1, exact y = e^{-x} cosh x). We follow the
reference problem: residual = u' + u - int, plus the IC.
"""

import sys

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import jacobian


def build_solver(epochs=50, iters_per_epoch=20, output_dir="./output_volterra"):
    psci.utils.set_random_seed(42)
    bound, num_points, quad_deg = 0.0, 12, 20
    t1 = 5.0

    model = psci.arch.MLP(("x",), ("u",), 3, 20)

    eq = psci.equation.Volterra(
        bound,
        num_points,
        quad_deg,
        lambda t, s: np.exp(s - t),
        # lhs of the reference problem: u' + u
        lambda out: jacobian(out["u"], out["x"]) + out["u"],
    )
    # collocation points + quadrature extension (static)
    x_col = np.linspace(0, t1, num_points, dtype=np.float32)
    full_x = eq.precompute(x_col)

    sup = psci.constraint.SupervisedConstraint(
        {
            "dataset": {
                "name": "IterableNamedArrayDataset",
                "input": {"x": full_x},
                "label": {"volterra": np.zeros((num_points, 1), np.float32)},
            },
        },
        psci.loss.MSELoss("mean"),
        {"volterra": eq.equations["volterra"]},
        name="EQ",
    )
    ic = psci.constraint.SupervisedConstraint(
        {
            "dataset": {
                "name": "IterableNamedArrayDataset",
                "input": {"x": np.zeros((1, 1), np.float32)},
                "label": {"u": np.ones((1, 1), np.float32)},
            },
        },
        psci.loss.MSELoss("mean"),
        {"u": lambda out: out["u"]},
        name="IC",
    )

    def u_exact(out):
        x = out["x"]
        return np.exp(-x) * np.cosh(x)

    validator = {
        "u_val": psci.validate.GeometryValidator(
            {"u": lambda out: out["u"]},
            {"u": u_exact},
            psci.geometry.Interval(0, t1),
            {"dataset": "IterableNamedArrayDataset", "total_size": 100},
            psci.loss.MSELoss(),
            evenly=True,
            metric={"L2Rel": psci.metric.L2Rel()},
            name="u_val",
        )
    }
    return psci.solver.Solver(
        model,
        {"EQ": sup, "IC": ic},
        output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        validator=validator,
        log_freq=200,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/volterra_ide.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
