"""Chip heat simulation via ChipDeepONets (reference
``examples/chip_heat/chip_heat.py``).

Operator learning for 2D chip thermal fields: a power-map branch net, a
boundary-type branch, a boundary-value branch and a coordinate trunk
(``psci.arch.ChipDeepONets``) trained purely from physics residuals on
Gaussian-random-field (GRF) heat sources. The bc-type switch selects, per
sample, Dirichlet (bc=0), Neumann (bc=1), convection (bc=2) or radiation
(bc=3) boundary residuals (reference chip_heat.py:216-235); the interior
residual is the Poisson thermal conduction equation
d2T/dx2 + d2T/dy2 + 100 u = 0. Training data pairs every spatial point with
every GRF sample through ChipHeatDataset's cartesian-product indexing.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import ad, hessian, jacobian


def _fftind(size):
    k_ind = np.mgrid[:size, :size] - int((size + 1) / 2)
    return np.fft.fftshift(k_ind, axes=(1, 2))


def grf(rng, alpha=3.0, size=128, flag_normalize=True):
    """Gaussian random field with power-law spectrum (reference chip_heat.py:45-73)."""
    k_idx = _fftind(size)
    amplitude = np.power(k_idx[0] ** 2 + k_idx[1] ** 2 + 1e-10, -alpha / 4.0)
    amplitude[0, 0] = 0
    noise = rng.normal(size=(size, size)) + 1j * rng.normal(size=(size, size))
    gfield = np.fft.ifft2(noise * amplitude).real
    if flag_normalize:
        gfield = (gfield - np.mean(gfield)) / np.std(gfield)
    return gfield.reshape([1, -1])


def _bc_residual_x(out):
    """BC residual switch in x-normal direction (top/down edges)."""
    T = ad.unwrap(out["T"])
    T_x = ad.unwrap(jacobian(out["T"], out["x"]))
    u_one = ad.unwrap(out["u_one"])
    bc = ad.unwrap(out["bc"])
    import jax.numpy as jnp

    rad = T_x + u_one * (T**2 - 1) * (T**2 + 1) * 5.6 / 50000
    conv = T_x + u_one * (T - 1)
    return jnp.where(bc == 1, T_x - u_one,
                     jnp.where(bc == 0, T - u_one, jnp.where(bc == 2, conv, rad)))


def _bc_residual_y(out):
    T = ad.unwrap(out["T"])
    T_y = ad.unwrap(jacobian(out["T"], out["y"]))
    u_one = ad.unwrap(out["u_one"])
    bc = ad.unwrap(out["bc"])
    import jax.numpy as jnp

    rad = T_y + u_one * (T**2 - 1) * (T**2 + 1) * 5.6 / 50000
    conv = T_y + u_one * (T - 1)
    return jnp.where(bc == 1, T_y - u_one,
                     jnp.where(bc == 0, T - u_one, jnp.where(bc == 2, conv, rad)))


def build_solver(epochs=20000, iters_per_epoch=1, output_dir="./outputs_chip_heat",
                 learning_rate=1e-3, nl=20, nw=20, nu=500, nbc=500, dl=1.0, dw=1.0,
                 grf_alpha=3.0, batch_size=1000, weight=100.0,
                 num_features=400, branch_layers=9, trunk_layers=6,
                 branch_hidden=256, trunk_hidden=128,
                 eval_during_train=False, eval_freq=1000):
    psci.utils.set_random_seed(42)
    rng = np.random.default_rng(42)
    NPOINT = nl * nw
    geom = psci.geometry.Rectangle((0, 0), (dl, dw))
    points = geom.sample_interior(NPOINT, evenly=True)

    # GRF heat-source samples + boundary-data samples (reference :84-95)
    data_u = np.ones([1, (nl - 2) * (nw - 2)])
    data_bc = np.ones([1, NPOINT])
    data_u = np.vstack((data_u, np.zeros([1, (nl - 2) * (nw - 2)])))
    data_bc = np.vstack((data_bc, np.zeros([1, NPOINT])))
    for _ in range(nu - 2):
        data_u = np.vstack((data_u, grf(rng, alpha=grf_alpha, size=nl - 2)))
    for _ in range(nbc - 2):
        data_bc = np.vstack((data_bc, grf(rng, alpha=grf_alpha, size=nl)))
    data_u = data_u.astype("float32")
    data_bc = data_bc.astype("float32")
    test_u = grf(rng, alpha=4, size=nl).astype("float32")[0]

    x, y = points["x"], points["y"]
    b_idx = np.where((x == 0) | (x == dw) | (y == 0) | (y == dl))[0]
    i_idx = np.where((x != 0) & (x != dw) & (y != 0) & (y != dl))[0]
    points["u"] = np.tile(test_u[i_idx], (NPOINT, 1))
    points["u_one"] = test_u.T.reshape([-1, 1])
    points["bc_data"] = np.tile(test_u[b_idx], (NPOINT, 1))
    points["bc"] = np.zeros((NPOINT, 1), dtype="float32")

    top_i = np.where(x == dw)[0]
    down_i = np.where(x == 0)[0]
    left_i = np.where((y == 0) & (x != 0) & (x != dw))[0]
    right_i = np.where((y == dl) & (x != 0) & (x != dw))[0]

    def subset(idx):
        return {k: points[k][idx] for k in ("x", "y", "u", "u_one", "bc", "bc_data")}

    test_top, test_down, test_left, test_right, test_interior = (
        subset(i) for i in (top_i, down_i, left_i, right_i, i_idx))

    bctypes = np.array([[0], [1], [2], [3]], dtype="float32")

    def region_data(idx):
        return {
            "x": points["x"][idx], "y": points["y"][idx],
            "u": data_u, "u_one": data_bc[:, idx].T.reshape([-1, 1]),
            "bc": bctypes, "bc_data": data_bc[:, b_idx],
        }

    interior_data = {
        "x": points["x"][i_idx], "y": points["y"][i_idx],
        "u": data_u, "u_one": data_u.T.reshape([-1, 1]),
        "bc": bctypes, "bc_data": data_bc[:, b_idx],
    }

    model = psci.arch.ChipDeepONets(
        branch_input_keys=("u",), BCtype_input_keys=("bc",), BC_input_keys=("bc_data",),
        trunk_input_keys=("x", "y"), output_keys=("T",),
        num_loc=(nl - 2) * (nw - 2), bctype_loc=1, BC_num_loc=len(b_idx),
        num_features=num_features,
        branch_num_layers=branch_layers, BC_num_layers=branch_layers,
        trunk_num_layers=trunk_layers,
        branch_hidden_size=branch_hidden, BC_hidden_size=branch_hidden,
        trunk_hidden_size=trunk_hidden,
    )

    label = {"chip": np.array([0], dtype="float32")}
    wgt = {"chip": np.array([weight], dtype="float32")}
    index = ("x", "u", "bc", "bc_data")

    def sup(name, data, expr, data_type):
        return psci.constraint.SupervisedConstraint(
            {"dataset": {"name": "ChipHeatDataset", "input": data, "label": label,
                         "index": index, "data_type": data_type, "weight": wgt},
             "batch_size": batch_size, "iters_per_epoch": iters_per_epoch,
             "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": True}},
            psci.loss.MSELoss("mean"),
            output_expr={"chip": expr},
            name=name,
        )

    def interior_expr(out):
        T_xx = ad.unwrap(hessian(out["T"], out["x"]))
        T_yy = ad.unwrap(hessian(out["T"], out["y"]))
        return T_xx + T_yy + 100 * ad.unwrap(out["u_one"])

    constraint = {
        "top_sup": sup("top_sup", region_data(top_i), _bc_residual_x, "bc_data"),
        "down_sup": sup("down_sup", region_data(down_i), _bc_residual_x, "bc_data"),
        "left_sup": sup("left_sup", region_data(left_i), _bc_residual_y, "bc_data"),
        "right_sup": sup("right_sup", region_data(right_i), _bc_residual_y, "bc_data"),
        "interior_sup": sup("interior_sup", interior_data, interior_expr, "u"),
    }

    optimizer = psci.optimizer.Adam(learning_rate)(model)

    def val(name, data, n, expr):
        return psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset", "input": data,
                         "label": {"chip": np.zeros([n, 1], dtype="float32")}},
             "total_size": n, "batch_size": n,
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.MSELoss("mean"),
            output_expr={"chip": expr},
            metric={"MSE": psci.metric.MSE()},
            name=name,
        )

    bval = lambda out: ad.unwrap(out["T"]) - ad.unwrap(out["u_one"])
    validator = {
        "top_mse": val("top_mse", test_top, len(top_i), bval),
        "down_mse": val("down_mse", test_down, len(down_i), bval),
        "left_mse": val("left_mse", test_left, len(left_i), bval),
        "right_mse": val("right_mse", test_right, len(right_i), bval),
        "interior_mse": val("interior_mse", test_interior, len(i_idx), interior_expr),
    }

    return psci.solver.Solver(
        model, constraint, output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        eval_during_train=eval_during_train,
        eval_freq=eval_freq,
        validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/chip_heat.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
