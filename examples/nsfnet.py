"""NSFNet: Navier-Stokes flow nets (reference ``examples/nsfnet/VP_NSFNet{1..4}.py``).

VP (velocity-pressure) PINNs trained from supervised boundary/initial data
plus interior NS residuals on a PointCloud of collocation points:

- net=1  Kovasznay flow (2D steady, analytic solution)       VP_NSFNet1.py
- net=2  cylinder wake (2D unsteady, cylinder_nektar_wake.mat) VP_NSFNet2.py
- net=3  Beltrami flow (3D unsteady, analytic solution)      VP_NSFNet3.py
- net=4  JHTDB turbulent channel (3D unsteady, .npy data)    VP_NSFNet4.py

Training = Adam with a Piecewise LR ladder, then an optional L-BFGS polish
phase re-using the trained params (reference VP_NSFNet1.py:180-255). Nets 2
and 4 require the reference's data files under ``data_dir`` and raise a
descriptive error when absent (no silent synthesis).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci


# ----------------------------------------------------------------- net 1 --
def kovasznay(x, y, lam):
    u = 1 - np.exp(lam * x) * np.cos(2 * np.pi * y)
    v = lam / (2 * np.pi) * np.exp(lam * x) * np.sin(2 * np.pi * y)
    p = 0.5 * (1 - np.exp(2 * lam * x))
    return u, v, p


def data_net1(n_train, lam, seed):
    rng = np.random.default_rng(seed)
    x = np.linspace(-0.5, 1.0, 101)
    y = np.linspace(-0.5, 1.5, 101)
    yb1, yb2 = np.full(100, -0.5), np.full(100, 1.0)
    xb1, xb2 = np.full(100, -0.5), np.full(100, 1.5)
    y_b = np.concatenate([y[1:101], y[0:100], xb1, xb2], 0).astype("float32")
    x_b = np.concatenate([yb1, yb2, x[0:100], x[1:101]], 0).astype("float32")
    xb_train, yb_train = x_b.reshape(-1, 1), y_b.reshape(-1, 1)
    ub_train, vb_train, _ = kovasznay(xb_train, yb_train, lam)

    x_train = ((rng.random((n_train, 1)) - 1 / 3) * 3 / 2).astype("float32")
    y_train = ((rng.random((n_train, 1)) - 1 / 4) * 2).astype("float32")
    x_star = ((rng.random((1000, 1)) - 1 / 3) * 3 / 2).astype("float32")
    y_star = ((rng.random((1000, 1)) - 1 / 4) * 2).astype("float32")
    u_star, v_star, p_star = kovasznay(x_star, y_star, lam)
    return (
        {"x": x_train, "y": y_train},
        {"input": {"x": xb_train, "y": yb_train},
         "label": {"u": ub_train.astype("float32"), "v": vb_train.astype("float32")}},
        None,
        {"input": {"x": x_star, "y": y_star},
         "label": {"u": u_star.astype("float32"), "v": v_star.astype("float32"), "p": p_star.astype("float32")}},
    )


# ----------------------------------------------------------------- net 3 --
def beltrami(x, y, z, t, a=1.0, d=1.0):
    u = -a * (np.exp(a * x) * np.sin(a * y + d * z) + np.exp(a * z) * np.cos(a * x + d * y)) * np.exp(-d * d * t)
    v = -a * (np.exp(a * y) * np.sin(a * z + d * x) + np.exp(a * x) * np.cos(a * y + d * z)) * np.exp(-d * d * t)
    w = -a * (np.exp(a * z) * np.sin(a * x + d * y) + np.exp(a * y) * np.cos(a * z + d * x)) * np.exp(-d * d * t)
    p = (
        -0.5
        * a**2
        * (
            np.exp(2 * a * x) + np.exp(2 * a * y) + np.exp(2 * a * z)
            + 2 * np.sin(a * x + d * y) * np.cos(a * z + d * x) * np.exp(a * (y + z))
            + 2 * np.sin(a * y + d * z) * np.cos(a * x + d * y) * np.exp(a * (z + x))
            + 2 * np.sin(a * z + d * x) * np.cos(a * y + d * z) * np.exp(a * (x + y))
        )
        * np.exp(-2 * d * d * t)
    )
    return u, v, w, p


def data_net3(n_train, seed):
    rng = np.random.default_rng(seed)
    # boundary: the six cube faces x a time grid (reference VP_NSFNet3.py:55-87)
    grid = np.linspace(-1, 1, 31).astype("float32")
    t1 = np.linspace(0, 1, 11).astype("float32")
    faces = []
    for axis in range(3):
        for val in (-1.0, 1.0):
            gu, gv = np.meshgrid(grid[:30], grid[:30], indexing="ij")
            pts = np.zeros((900, 3), "float32")
            pts[:, axis] = val
            pts[:, (axis + 1) % 3] = gu.ravel()
            pts[:, (axis + 2) % 3] = gv.ravel()
            faces.append(pts)
    fpts = np.concatenate(faces, 0)
    xyzb = np.repeat(fpts, t1.shape[0], axis=0)
    tb = np.tile(t1, fpts.shape[0]).reshape(-1, 1)
    ub, vb, wb, _ = beltrami(xyzb[:, :1], xyzb[:, 1:2], xyzb[:, 2:3], tb)

    # initial slab t=0 on the full 31^3 grid
    gx, gy, gz = np.meshgrid(grid, grid, grid, indexing="ij")
    x0, y0, z0 = (g.reshape(-1, 1) for g in (gx, gy, gz))
    t0 = np.zeros_like(x0)
    u0, v0, w0, _ = beltrami(x0, y0, z0, t0)

    # interior collocation on the lattice
    xx = (rng.integers(0, 31, n_train) / 15 - 1).astype("float32").reshape(-1, 1)
    yy = (rng.integers(0, 31, n_train) / 15 - 1).astype("float32").reshape(-1, 1)
    zz = (rng.integers(0, 31, n_train) / 15 - 1).astype("float32").reshape(-1, 1)
    tt = (rng.integers(0, 11, n_train) / 10).astype("float32").reshape(-1, 1)

    x_s = ((rng.random((1000, 1)) - 0.5) * 2).astype("float32")
    y_s = ((rng.random((1000, 1)) - 0.5) * 2).astype("float32")
    z_s = ((rng.random((1000, 1)) - 0.5) * 2).astype("float32")
    t_s = (rng.integers(0, 11, (1000, 1)) / 10).astype("float32")
    u_s, v_s, w_s, p_s = beltrami(x_s, y_s, z_s, t_s)
    f32 = lambda a: a.astype("float32")
    return (
        {"x": xx, "y": yy, "z": zz, "t": tt},
        {"input": {"x": f32(xyzb[:, :1]), "y": f32(xyzb[:, 1:2]), "z": f32(xyzb[:, 2:3]), "t": tb},
         "label": {"u": f32(ub), "v": f32(vb), "w": f32(wb)}},
        {"input": {"x": f32(x0), "y": f32(y0), "z": f32(z0), "t": f32(t0)},
         "label": {"u": f32(u0), "v": f32(v0), "w": f32(w0)}},
        {"input": {"x": x_s, "y": y_s, "z": z_s, "t": t_s},
         "label": {"u": f32(u_s), "v": f32(v_s), "w": f32(w_s), "p": f32(p_s)}},
    )


# ----------------------------------------------------------------- net 2/4 --
def data_net2(data_dir, n_train, seed):
    path = osp.join(data_dir, "cylinder_nektar_wake.mat")
    if not osp.exists(path):
        raise FileNotFoundError(
            f"NSFNet2 requires {path} (reference examples/nsfnet dataset); "
            "download cylinder_nektar_wake.mat into data_dir")
    from paddlescience_tpu.utils import reader

    data = reader.load_mat_file(path, keys=None)
    rng = np.random.default_rng(seed)
    X_star, U_star, P_star, t_star = data["X_star"], data["U_star"], data["p_star"], data["t"]
    N, T = X_star.shape[0], t_star.shape[0]
    xx = np.tile(X_star[:, 0:1], (1, T)).flatten()[:, None]
    yy = np.tile(X_star[:, 1:2], (1, T)).flatten()[:, None]
    tt = np.tile(t_star, (1, N)).T.flatten()[:, None]
    uu = U_star[:, 0, :].flatten()[:, None]
    vv = U_star[:, 1, :].flatten()[:, None]
    pp = P_star.flatten()[:, None]
    idx = rng.choice(N * T, n_train, replace=False)
    f32 = lambda a: a.astype("float32")
    sup = {"input": {"x": f32(xx[idx]), "y": f32(yy[idx]), "t": f32(tt[idx])},
           "label": {"u": f32(uu[idx]), "v": f32(vv[idx])}}
    val = {"input": {"x": f32(xx), "y": f32(yy), "t": f32(tt)},
           "label": {"u": f32(uu), "v": f32(vv), "p": f32(pp)}}
    return ({"x": f32(xx[idx]), "y": f32(yy[idx]), "t": f32(tt[idx])}, sup, None, val)


def data_net4(data_dir, seed):
    needed = ["train_ini2.npy", "train_iniv2.npy", "train_xb2.npy", "train_vb2.npy",
              "test43_l.npy", "test43_vp.npy"]
    missing = [f for f in needed if not osp.exists(osp.join(data_dir, f))]
    if missing:
        raise FileNotFoundError(
            f"NSFNet4 requires JHTDB data files {missing} under {data_dir} "
            "(reference VP_NSFNet4.py:29-45)")
    rng = np.random.default_rng(seed)
    f32 = lambda a: np.asarray(a, "float32")
    ini = f32(np.load(osp.join(data_dir, "train_ini2.npy")))
    iniv = f32(np.load(osp.join(data_dir, "train_iniv2.npy")))
    xb = f32(np.load(osp.join(data_dir, "train_xb2.npy")))
    vb = f32(np.load(osp.join(data_dir, "train_vb2.npy")))
    xnode = np.linspace(12.47, 12.66, 191, dtype="float32")
    ynode = np.linspace(-1, -0.0031, 998, dtype="float32")
    znode = np.linspace(4.61, 4.82, 211, dtype="float32")
    xi = xnode[rng.integers(0, 191, 100000)].reshape(-1, 1)
    yi = ynode[rng.integers(0, 998, 100000)].reshape(-1, 1)
    zi = znode[rng.integers(0, 211, 100000)].reshape(-1, 1)
    times = (np.arange(17, dtype="float32") * 0.0065)
    interior = {
        "x": np.tile(xi, (17, 1)), "y": np.tile(yi, (17, 1)), "z": np.tile(zi, (17, 1)),
        "t": times.repeat(100000).reshape(-1, 1),
    }
    test_x = f32(np.load(osp.join(data_dir, "test43_l.npy")))
    test_v = f32(np.load(osp.join(data_dir, "test43_vp.npy")))
    t = np.array([1, 4, 7, 10, 13], dtype="float32") * 0.0065
    t_star = np.tile(t.reshape(5, 1), (1, 3000)).reshape(-1, 1)
    val = {"input": {"x": np.tile(test_x[:, 0:1], (5, 1)), "y": np.tile(test_x[:, 1:2], (5, 1)),
                     "z": np.tile(test_x[:, 2:3], (5, 1)), "t": t_star},
           "label": {"u": test_v[:, 0:1], "v": test_v[:, 1:2], "w": test_v[:, 2:3], "p": test_v[:, 3:4]}}
    sup_b = {"input": {"x": xb[:, 0:1], "y": xb[:, 1:2], "z": xb[:, 2:3], "t": xb[:, 3:4]},
             "label": {"u": vb[:, 0:1], "v": vb[:, 1:2], "w": vb[:, 2:3]}}
    sup_0 = {"input": {"x": ini[:, 0:1], "y": ini[:, 1:2], "z": ini[:, 2:3],
                       "t": np.zeros_like(ini[:, 0:1])},
             "label": {"u": iniv[:, 0:1], "v": iniv[:, 1:2], "w": iniv[:, 2:3]}}
    return interior, sup_b, sup_0, val


# ------------------------------------------------------------------ build --
def build_solver(net=1, epochs=10, iters_per_epoch=10, output_dir="./outputs_nsfnet",
                 ntrain=2601, re=40.0, alpha=100.0, beta=100.0, data_dir="./dataset/nsfnet",
                 learning_rate=1e-3, lbfgs=False, lbfgs_max_iter=50, seed=1234):
    psci.utils.set_random_seed(seed)
    net = int(net)
    dim3 = net in (3, 4)
    time_dep = net in (2, 3, 4)
    in_keys = ("x", "y") + (("z",) if dim3 else ()) + (("t",) if time_dep else ())
    out_keys = ("u", "v") + (("w",) if dim3 else ()) + ("p",)
    model = psci.arch.MLP(in_keys, out_keys, 4 if net == 1 else 10, 50 if net == 1 else 100,
                          activation="tanh")

    if net == 1:
        lam = 0.5 * re - np.sqrt(0.25 * re**2 + 4 * np.pi**2)
        interior, sup_b, sup_0, val = data_net1(ntrain, lam, seed)
        nu = 1.0 / re
    elif net == 2:
        interior, sup_b, sup_0, val = data_net2(data_dir, ntrain, seed)
        nu = 0.01
    elif net == 3:
        interior, sup_b, sup_0, val = data_net3(ntrain, seed)
        nu = 1.0
    else:
        interior, sup_b, sup_0, val = data_net4(data_dir, seed)
        nu = 1.0 / 4850.0

    equation = {"NavierStokes": psci.equation.NavierStokes(
        nu=nu, rho=1.0, dim=3 if dim3 else 2, time=time_dep)}
    geom = psci.geometry.PointCloud(interior, in_keys)

    resid_names = ["continuity", "momentum_x", "momentum_y"] + (["momentum_z"] if dim3 else [])
    n_interior = len(next(iter(interior.values())))
    pde = psci.constraint.InteriorConstraint(
        equation["NavierStokes"].equations,
        {k: 0 for k in resid_names},
        geom,
        {"dataset": {"name": "IterableNamedArrayDataset"}, "batch_size": n_interior,
         "iters_per_epoch": iters_per_epoch},
        psci.loss.MSELoss("mean"),
        name="EQ",
    )
    constraint = {"EQ": pde}

    def sup_constraint(blob, weight, name):
        nb = len(next(iter(blob["input"].values())))
        return psci.constraint.SupervisedConstraint(
            {"dataset": {"name": "NamedArrayDataset", "input": blob["input"], "label": blob["label"]},
             "batch_size": nb, "iters_per_epoch": iters_per_epoch,
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.MSELoss("mean", weight={k: weight for k in blob["label"]}),
            name=name,
        )

    constraint["Sup_b"] = sup_constraint(sup_b, alpha if net in (3, 4) else 1.0, "Sup_b")
    if sup_0 is not None:
        constraint["Sup_0"] = sup_constraint(sup_0, beta, "Sup_0")

    validator = {
        "Residual": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset", "input": val["input"], "label": val["label"]},
             "total_size": len(next(iter(val["input"].values()))),
             "batch_size": min(10000, len(next(iter(val["input"].values())))),
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.L2RelLoss(),
            metric={"L2R": psci.metric.L2Rel()},
            name="Residual",
        )
    }

    if lbfgs:
        optimizer = psci.optimizer.LBFGS(max_iter=lbfgs_max_iter)(model)
    else:
        # Piecewise LR ladder 1e-3 / 1e-4 / 1e-5 / 1e-6 over epoch segments
        # (reference VP_NSFNet1.py:180-186, scaled to the configured epochs)
        bounds = [int(epochs * f) for f in (0.1, 0.2, 0.6)]
        lr_sched = psci.optimizer.lr_scheduler.Piecewise(
            iters_per_epoch, bounds,
            [learning_rate, learning_rate / 10, learning_rate / 100, learning_rate / 1000],
            epochs=epochs)()
        optimizer = psci.optimizer.Adam(lr_sched)(model)

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
    import _runner

    @psci.utils.config.main("conf/nsfnet.yaml")
    def _main(cfg):
        def train(c):
            solver = _runner.build_from_cfg(c, build_solver)
            solver.train()
            metric, group = solver.eval()
            _runner._print_metrics("adam-phase", metric, group)
            if c.TRAIN.lbfgs_epochs:
                polish = _runner.build_from_cfg(c, build_solver, lbfgs=True,
                                                epochs=c.TRAIN.lbfgs_epochs)
                polish.state["params"] = solver.state["params"]
                polish.train()
                metric, group = polish.eval()
                _runner._print_metrics("lbfgs-phase", metric, group)
            return metric

        return psci.utils.config.dispatch(
            cfg,
            train=train,
            evaluate=lambda c: _runner.evaluate(c, lambda cc: _runner.build_from_cfg(cc, build_solver)),
            export=lambda c: _runner.export(c, lambda cc: _runner.build_from_cfg(cc, build_solver)),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
