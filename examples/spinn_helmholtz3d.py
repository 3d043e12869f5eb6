"""SPINN Helmholtz 3-D (reference ``examples/spinn/helmholtz3d.py``).

(u_xx + u_yy + u_zz) + k^2 u = q on (-1,1)^3 with manufactured solution
u* = sin(a1 pi x) sin(a2 pi y) sin(a3 pi z). SPINN evaluates on a product
grid of N points per axis — N^3 collocation points for O(3N) network cost.
Per-axis coordinates are resampled ON DEVICE each step.
"""

import sys

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import hessian

A1, A2, A3 = 4.0, 4.0, 3.0
K = 1.0


def build_solver(epochs=50, iters_per_epoch=100, nc=64, hidden_size=64,
                 nc_test=100, output_dir="./output_spinn_helmholtz3d"):
    import jax
    import jax.numpy as jnp

    from paddlescience_tpu.constraint.base import Constraint
    from paddlescience_tpu.data import DeviceSampledDataset

    psci.utils.set_random_seed(42)
    model = psci.arch.SPINN(("x", "y", "z"), ("u",), r=32, num_layers=4, hidden_size=hidden_size)

    # hard Dirichlet BC: multiply by sin(pi x)sin(pi y)sin(pi z), which
    # vanishes on the cube boundary (u* does too since a_i are integers)
    def hard_bc(inp, out):
        env = (
            jnp.sin(jnp.pi * inp["x"][:, None, None, :])
            * jnp.sin(jnp.pi * inp["y"][None, :, None, :])
            * jnp.sin(jnp.pi * inp["z"][None, None, :, :])
        )
        return {"u": out["u"] * env}

    model.register_output_transform(hard_bc)

    lam = K**2 - ((A1 * np.pi) ** 2 + (A2 * np.pi) ** 2 + (A3 * np.pi) ** 2)

    def u_star(x, y, z):
        return (
            jnp.sin(A1 * jnp.pi * x[:, None, None])
            * jnp.sin(A2 * jnp.pi * y[None, :, None])
            * jnp.sin(A3 * jnp.pi * z[None, None, :])
        )

    def sample_fn(key):
        ks = jax.random.split(key, 3)
        # reference domain [-1, 1]^3, nc points per axis (helmholtz3d.py:52-54)
        coords = {k: jax.random.uniform(ks[i], (nc, 1), minval=-1.0, maxval=1.0)
                  for i, k in enumerate("xyz")}
        q = lam * u_star(coords["x"][:, 0], coords["y"][:, 0], coords["z"][:, 0])[..., None]
        return coords, {"helmholtz": q}, {}

    def helmholtz(out):
        u = out["u"]
        return hessian(u, out["x"]) + hessian(u, out["y"]) + hessian(u, out["z"]) + (K**2) * u

    pde = Constraint(DeviceSampledDataset(sample_fn), None, psci.loss.MSELoss("mean"), "EQ")
    pde.output_expr = {"helmholtz": helmholtz}

    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3, gamma=0.9, decay_steps=1000
    )()
    optimizer = psci.optimizer.Adam(lr)(model)

    # validator on the reference test grid: nc_test^3 product points on
    # [-1, 1]^3 (reference helmholtz3d.py:86-91, EVAL.nc=100)
    grid = np.linspace(-1, 1, nc_test, dtype=np.float32).reshape(-1, 1)
    u_ref_grid = np.asarray(u_star(grid[:, 0], grid[:, 0], grid[:, 0]))[..., None]
    validator = {
        "u_val": psci.validate.SupervisedValidator(
            {
                "dataset": {
                    "name": "IterableNamedArrayDataset",
                    "input": {"x": grid, "y": grid, "z": grid},
                    "label": {"u": u_ref_grid},
                },
            },
            psci.loss.MSELoss(),
            {"u": lambda out: out["u"]},
            metric={"L2Rel": psci.metric.L2Rel()},
            name="u_val",
        )
    }

    return psci.solver.Solver(
        model,
        {"EQ": pde},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        validator=validator,
        log_freq=100,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/spinn_helmholtz3d.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
