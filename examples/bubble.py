"""BubbleNet: semi-supervised two-phase bubble flow (reference
``examples/bubble/bubble.py``).

Three MLPs over (t, x, y) — psi-net (stream function, with the
u = dpsi/dy, v = -dpsi/dx output transform, reference bubble.py:96-104),
p-net (pressure) and phil-net (level-set fraction) — trained on 75% of the
field data plus a pressure-Poisson interior residual
d2p/dx2 + d2p/dy2 = 0 (reference bubble.py:127-141). Data: ``DATA_PATH``
(bubble.mat: X(N,2), t(T,1), u/v/p/phil (N,T)); when the .mat is absent a
documented synthetic rising-bubble field on the same layout is generated
(explicit fallback, printed loudly).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import hessian, jacobian


def _synthetic_bubble(nx=30, ny=10, nt=21):
    """Rising-bubble-like analytic field on [0,15]x[0,5], t in [1, nt]."""
    x = np.linspace(0, 15, nx)
    y = np.linspace(0, 5, ny)
    gx, gy = np.meshgrid(x, y, indexing="ij")
    X = np.stack([gx.ravel(), gy.ravel()], 1)
    t = np.arange(1, nt + 1, dtype=np.float64).reshape(-1, 1)
    N, T = X.shape[0], nt
    xc, r = 7.5, 1.0
    u = np.zeros((N, T))
    v = np.zeros((N, T))
    p = np.zeros((N, T))
    phil = np.zeros((N, T))
    for k in range(T):
        yc = 0.5 + 4.0 * (k / max(T - 1, 1))
        d2 = (X[:, 0] - xc) ** 2 + (X[:, 1] - yc) ** 2
        phil[:, k] = 1.0 / (1.0 + np.exp((d2 - r**2) * 4.0))
        u[:, k] = -0.3 * (X[:, 1] - yc) * np.exp(-d2 / (2 * r**2))
        v[:, k] = 0.3 * (X[:, 0] - xc) * np.exp(-d2 / (2 * r**2)) + 0.2 * phil[:, k]
        p[:, k] = np.exp(-d2 / (2 * r**2)) * 0.5
    return {"X": X, "t": t, "u": u, "v": v, "p": p, "phil": phil}


def load_data(data_path):
    if data_path and osp.exists(data_path):
        from paddlescience_tpu.utils import reader

        return reader.load_mat_file(data_path, keys=None)
    print(f"[bubble] DATA_PATH {data_path!r} not found -> synthetic rising-bubble field "
          "(download bubble.mat for the reference dataset)")
    return _synthetic_bubble()


def build_solver(epochs=10000, iters_per_epoch=1, output_dir="./outputs_bubble",
                 learning_rate=1e-3, data_path="bubble.mat", train_frac=0.75,
                 pde_batch=None, sup_batch=None, eval_during_train=False, eval_freq=1000):
    psci.utils.set_random_seed(42)
    data = load_data(data_path)

    def norm(a):
        amin, amax = a.min(axis=0), a.max(axis=0)
        return (a - amin) / np.maximum(amax - amin, 1e-12)

    u_star, v_star, p_star = norm(data["u"]), norm(data["v"]), norm(data["p"])
    phil_star, t_star, x_star = data["phil"], data["t"], data["X"]
    N, T = x_star.shape[0], t_star.shape[0]

    xx = np.tile(x_star[:, 0:1], (1, T)).flatten()[:, None].astype("float32")
    yy = np.tile(x_star[:, 1:2], (1, T)).flatten()[:, None].astype("float32")
    tt = np.tile(t_star, (1, N)).T.flatten()[:, None].astype("float32")
    u = u_star.flatten()[:, None].astype("float32")
    v = v_star.flatten()[:, None].astype("float32")
    p = p_star.flatten()[:, None].astype("float32")
    phil = phil_star.flatten()[:, None].astype("float32")

    rng = np.random.default_rng(42)
    idx = rng.choice(N * T, int(N * T * train_frac), replace=False)
    train_input = {"x": xx[idx], "y": yy[idx], "t": tt[idx]}
    train_label = {"u": u[idx], "v": v[idx], "p": p[idx], "phil": phil[idx]}
    test_input = {"x": xx, "y": yy, "t": tt}
    test_label = {"u": u, "v": v, "p": p, "phil": phil}

    model_psi = psci.arch.MLP(("t", "x", "y"), ("psi",), 9, 30, activation="tanh")
    model_p = psci.arch.MLP(("t", "x", "y"), ("p",), 9, 30, activation="tanh")
    model_phil = psci.arch.MLP(("t", "x", "y"), ("phil",), 9, 30, activation="tanh")

    def transform_out(in_, out):
        return {"u": jacobian(out["psi"], in_["y"]), "v": -jacobian(out["psi"], in_["x"])}

    model_psi.register_output_transform(transform_out)
    model_list = psci.arch.ModelList((model_psi, model_p, model_phil))

    geom = psci.geometry.PointCloud(train_input, ("t", "x", "y"))
    n_train = len(idx)
    pde_constraint = psci.constraint.InteriorConstraint(
        {"pressure_Poisson": lambda out: hessian(out["p"], out["x"]) + hessian(out["p"], out["y"])},
        {"pressure_Poisson": 0},
        geom,
        {"dataset": "IterableNamedArrayDataset",
         "batch_size": int(pde_batch or n_train), "iters_per_epoch": iters_per_epoch},
        psci.loss.MSELoss("mean"),
        name="EQ",
    )
    sup_constraint = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset", "input": train_input, "label": train_label},
         "batch_size": int(sup_batch or min(2419, n_train)), "iters_per_epoch": iters_per_epoch,
         "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": True}},
        psci.loss.MSELoss("mean"),
        name="Sup",
    )
    constraint = {"Sup": sup_constraint, "EQ": pde_constraint}
    optimizer = psci.optimizer.Adam(learning_rate)(model_list)

    validator = {
        "bubble_mse": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset", "input": test_input, "label": test_label},
             "total_size": N * T, "batch_size": min(8192, N * T),
             "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": False}},
            psci.loss.MSELoss("mean"),
            metric={"MSE": psci.metric.MSE()},
            name="bubble_mse",
        )
    }
    return psci.solver.Solver(
        model_list,
        constraint,
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        eval_during_train=eval_during_train,
        eval_freq=eval_freq,
        validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/bubble.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
