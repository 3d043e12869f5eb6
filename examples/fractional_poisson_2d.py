"""Fractional Poisson on the unit disk (reference
``examples/fpde/fractional_poisson_2d.py``).

(-Delta)^{alpha/2} u = f on the unit disk with exact solution
u = (1 - x^2 - y^2)^{1 + alpha/2}, hard-constrained via the output transform
u <- (1 - r^2) u_raw (reference fractional_poisson_2d.py:67-70). The Caputo
directional quadrature is precomputed host-side (static matrix); the
extended point set (collocation + ray quadrature points) feeds one jitted
step.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci

ALPHA = 1.8


def u_exact(out):
    return np.abs(1 - (out["x"] ** 2 + out["y"] ** 2)) ** (1 + ALPHA / 2)


def build_solver(epochs=200, iters_per_epoch=1, output_dir="./outputs_fpde",
                 n_interior=100, n_bc=32, learning_rate=1e-3, alpha=ALPHA,
                 n_theta=8, n_r=40):
    import jax.numpy as jnp

    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y"), ("u",), 4, 20, activation="tanh")

    def output_transform(in_, out):
        return {"u": (1 - (in_["x"] ** 2 + in_["y"] ** 2)) * out["u"]}

    model.register_output_transform(output_transform)
    geom = psci.geometry.Disk((0, 0), 1)
    eq = psci.equation.FractionalPoisson(alpha, geom, (n_theta, n_r))

    # interior collocation (strictly inside: the GL rays need distance to
    # the boundary) + static quadrature extension
    pts = geom.sample_interior(4 * n_interior, random="Hammersley")
    xy = np.concatenate([pts["x"], pts["y"]], 1)
    inside = np.sum(xy**2, 1) < 0.95**2
    xy = xy[inside][:n_interior]
    full_xy = eq.precompute(xy)
    fpde_constraint = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset",
                     "input": {"x": full_xy[:, :1].astype("float32"),
                               "y": full_xy[:, 1:].astype("float32")},
                     "label": {"fpde": np.zeros((len(xy), 1), "float32")}},
         "iters_per_epoch": iters_per_epoch},
        psci.loss.MSELoss("mean"),
        {"fpde": eq.equations["fpde"]},
        name="FPDE",
    )
    validator = {
        "L2Rel": psci.validate.GeometryValidator(
            {"u": lambda out: out["u"]},
            {"u": u_exact},
            geom,
            {"dataset": "NamedArrayDataset", "total_size": 512, "batch_size": 512},
            psci.loss.MSELoss("mean"),
            metric={"L2Rel_u": psci.metric.L2Rel()},
            name="L2Rel",
        )
    }
    return psci.solver.Solver(
        model, {"FPDE": fpde_constraint}, output_dir,
        psci.optimizer.Adam(learning_rate)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        eval_during_train=False, validator=validator, equation={"fpde": eq},
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/fractional_poisson_2d.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
