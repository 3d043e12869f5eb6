"""DeepHPMs: deep hidden physics models on Burgers (reference
``examples/deephpms/burgers.py``; KdV/KS/NS/Schrodinger variants share the
same three-stage recipe).

Three MLPs: idn_net fits u(t,x) from data; pde_net learns the hidden
operator N(u, u_x, u_xx) such that u_t = N(...); sol_net solves the learned
PDE on a second dataset with periodic BCs. The reference's derivative-taking
input transform (``burgers.py:84-90``) is written TPU-natively here: feature
derivatives u_x, u_xx come from nested ``jax.jvp`` on the idn/sol net —
valid batched or per-point, so the whole composed model traces into one XLA
program at every stage.

Data: ``dataset_path``/``dataset_sol_path`` .mat files (t_train/x_train/
u_train/t_star/x_star/u_star); when absent, a spectral (FFT + RK4) viscous
Burgers solver generates the same layout.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import ad, jacobian

T_LB, T_UB = 0.0, 10.0
X_LB, X_UB = -8.0, 8.0
NU = 0.1


def spectral_burgers(nx=256, nt=201, nu=NU, seed=0, amp=1.0):
    """Periodic viscous Burgers u_t = -u u_x + nu u_xx via FFT + RK4."""
    rng = np.random.default_rng(seed)
    x = np.linspace(X_LB, X_UB, nx, endpoint=False)
    L = X_UB - X_LB
    k = 2 * np.pi * np.fft.fftfreq(nx, d=L / nx)
    u = -amp * np.sin(2 * np.pi * (x - X_LB) / L) + 0.1 * rng.standard_normal() * np.cos(
        4 * np.pi * (x - X_LB) / L)
    ts = np.linspace(T_LB, T_UB, nt)
    dt_out = ts[1] - ts[0]
    sub = 20
    dt = dt_out / sub

    def rhs(u):
        uh = np.fft.fft(u)
        ux = np.real(np.fft.ifft(1j * k * uh))
        uxx = np.real(np.fft.ifft(-(k**2) * uh))
        return -u * ux + nu * uxx

    snaps = [u.copy()]
    for _ in range(nt - 1):
        for _ in range(sub):
            k1 = rhs(u)
            k2 = rhs(u + 0.5 * dt * k1)
            k3 = rhs(u + 0.5 * dt * k2)
            k4 = rhs(u + dt * k3)
            u = u + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        snaps.append(u.copy())
    U = np.stack(snaps)  # (nt, nx)
    return ts, x, U


def _flatten(ts, x, U, n_train, rng):
    T, X = np.meshgrid(ts, x, indexing="ij")
    t_star = T.reshape(-1, 1).astype("float32")
    x_star = X.reshape(-1, 1).astype("float32")
    u_star = U.reshape(-1, 1).astype("float32")
    idx = rng.choice(len(t_star), n_train, replace=False)
    return dict(t_train=t_star[idx], x_train=x_star[idx], u_train=u_star[idx],
                t_star=t_star, x_star=x_star, u_star=u_star)


def load_data(path, seed, n_train=10000):
    if path and osp.exists(path):
        from paddlescience_tpu.utils import reader

        return reader.load_mat_file(path, keys=None)
    rng = np.random.default_rng(seed)
    ts, x, U = spectral_burgers(seed=seed, amp=1.0 + 0.2 * seed)
    return _flatten(ts, x, U, n_train, rng)


def _norm_t(t):
    return 2.0 * (t - T_LB) / (T_UB - T_LB) - 1.0


def _norm_x(x):
    return 2.0 * (x - X_LB) / (X_UB - X_LB) - 1.0


def make_transform_u():
    def transform_u(in_):
        return {"t": _norm_t(in_["t"]), "x": _norm_x(in_["x"])}

    return transform_u


def make_transform_f(u_model):
    """(t, x) -> (u, u_x, u_xx) of `u_model` via nested jvp (TPU-native
    version of reference burgers.py:84-90)."""
    import jax
    import jax.numpy as jnp

    def transform_f(in_):
        t, x = ad.unwrap(in_["t"]), ad.unwrap(in_["x"])
        key = u_model.output_keys[0]

        def u_of_x(xx):
            return u_model({"t": _norm_t(t), "x": _norm_x(xx)})[key]

        ones = jnp.ones_like(x)
        u, du_x = jax.jvp(u_of_x, (x,), (ones,))
        _, du_xx = jax.jvp(lambda xx: jax.jvp(u_of_x, (xx,), (ones,))[1], (x,), (ones,))
        return {"u_x": u, "du_x": du_x, "du_xx": du_xx}

    return transform_f


def _pde_loss(out, *args):
    import jax.numpy as jnp

    return {"pde": jnp.sum((out["f_pde"] - out["du_t"]) ** 2)}


def _pde_l2(out, *args):
    import jax.numpy as jnp

    return {"f_pde": jnp.linalg.norm(out["du_t"] - out["f_pde"]) / jnp.linalg.norm(out["du_t"])}


def _boundary_loss(out, *args):
    import jax.numpy as jnp

    u_b, du_x = out["u_sol"], out["du_x_sol"]
    n = u_b.shape[0] // 2
    return {"boundary": jnp.sum((u_b[:n] - u_b[n:]) ** 2) + jnp.sum((du_x[:n] - du_x[n:]) ** 2)}


def _mat_cfg(data, in_map, lab_map):
    return {"dataset": {
        "name": "NamedArrayDataset",
        "input": {k: data[v] for k, v in in_map.items()},
        "label": {k: data[v] for k, v in lab_map.items()},
    }, "batch_size": len(data[next(iter(in_map.values()))]),
        "iters_per_epoch": 1,
        "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}}


def run(cfg=None, epochs=(60, 60, 60), iters_per_epoch=1, lr=1e-3,
        output_dir="./outputs_deephpms", dataset_path=None, dataset_sol_path=None):
    psci.utils.set_random_seed(42)
    data_idn = load_data(dataset_path, seed=0)
    data_sol = load_data(dataset_sol_path, seed=1)

    model_idn = psci.arch.MLP(("t", "x"), ("u_idn",), 4, 50, activation="sin")
    model_pde = psci.arch.MLP(("u_x", "du_x", "du_xx"), ("f_pde",), 2, 100, activation="sin",
                              rngs=psci.nn.Rngs(1))
    model_sol = psci.arch.MLP(("t", "x"), ("u_sol",), 4, 50, activation="sin",
                              rngs=psci.nn.Rngs(2))
    model_idn.register_input_transform(make_transform_u())
    model_sol.register_input_transform(make_transform_u())
    model_pde.register_input_transform(make_transform_f(model_idn))

    # ---- stage 1: identification net fits u(t,x) --------------------------
    sup1 = psci.constraint.SupervisedConstraint(
        _mat_cfg(data_idn, {"t": "t_train", "x": "x_train"}, {"u_idn": "u_train"}),
        psci.loss.MSELoss("sum"), {"u_idn": lambda out: out["u_idn"]}, name="u_mse_sup")
    val1 = psci.validate.SupervisedValidator(
        _mat_cfg(data_idn, {"t": "t_star", "x": "x_star"}, {"u_idn": "u_star"}),
        psci.loss.MSELoss("sum"), {"u_idn": lambda out: out["u_idn"]},
        {"l2": psci.metric.L2Rel()}, name="u_L2_sup")
    s1 = psci.solver.Solver(
        model_idn, {"u_mse_sup": sup1}, output_dir, psci.optimizer.Adam(lr)(model_idn),
        epochs=epochs[0], iters_per_epoch=iters_per_epoch,
        validator={"u_L2_sup": val1}, eval_during_train=False)
    s1.train()
    m1, g1 = s1.eval()
    print(f"stage1 idn L2Rel = {m1:.4e}")

    # ---- stage 2: pde net learns u_t = N(u, u_x, u_xx) --------------------
    model_list2 = psci.arch.ModelList((model_idn, model_pde))
    model_idn.freeze()
    du_t_expr = lambda out: ad.unwrap(jacobian(out["u_idn"], out["t"]))
    sup2 = psci.constraint.SupervisedConstraint(
        _mat_cfg(data_idn, {"t": "t_train", "x": "x_train"}, {"du_t": "t_train"}),
        psci.loss.FunctionalLoss(_pde_loss),
        {"du_t": du_t_expr, "f_pde": lambda out: ad.unwrap(out["f_pde"])},
        name="f_mse_sup")
    val2 = psci.validate.SupervisedValidator(
        _mat_cfg(data_idn, {"t": "t_star", "x": "x_star"}, {"du_t": "t_star"}),
        psci.loss.FunctionalLoss(_pde_loss),
        {"du_t": du_t_expr, "f_pde": lambda out: ad.unwrap(out["f_pde"])},
        {"l2": psci.metric.FunctionalMetric(_pde_l2)}, name="f_L2_sup")
    s2 = psci.solver.Solver(
        model_list2, {"f_mse_sup": sup2}, output_dir, psci.optimizer.Adam(lr)(model_list2),
        epochs=epochs[1], iters_per_epoch=iters_per_epoch,
        validator={"f_L2_sup": val2}, eval_during_train=False)
    s2.train()
    m2, g2 = s2.eval()
    print(f"stage2 pde L2Rel = {m2:.4e}")

    # ---- stage 3: solution net solves the learned PDE ----------------------
    model_pde.register_input_transform(make_transform_f(model_sol))
    model_pde.freeze()
    model_list3 = psci.arch.ModelList((model_sol, model_pde))
    # periodic boundary pairs (x_lb stacked over x_ub)
    nt_b = 128
    rngb = np.random.default_rng(3)
    t_b = rngb.uniform(T_LB, T_UB, (nt_b, 1)).astype("float32")
    bc_input = {"t": np.concatenate([t_b, t_b]),
                "x": np.concatenate([np.full((nt_b, 1), X_LB, "float32"),
                                     np.full((nt_b, 1), X_UB, "float32")])}
    sup3_pde = psci.constraint.SupervisedConstraint(
        _mat_cfg(data_sol, {"t": "t_train", "x": "x_train"}, {"du_t": "t_train"}),
        psci.loss.FunctionalLoss(_pde_loss),
        {"du_t": lambda out: ad.unwrap(jacobian(out["u_sol"], out["t"])),
         "f_pde": lambda out: ad.unwrap(out["f_pde"])},
        name="f_mse_sup")
    sup3_bc = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset", "input": bc_input,
                     "label": {"boundary": np.zeros((2 * nt_b, 1), "float32")}},
         "batch_size": 2 * nt_b, "iters_per_epoch": 1,
         "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.FunctionalLoss(_boundary_loss),
        {"u_sol": lambda out: ad.unwrap(out["u_sol"]),
         "du_x_sol": lambda out: ad.unwrap(jacobian(out["u_sol"], out["x"]))},
        name="b_mse_sup")
    sup3_ic = psci.constraint.SupervisedConstraint(
        _mat_cfg({**data_sol,
                  "t0": np.zeros_like(data_sol["x_star"][:256]),
                  "x0": data_sol["x_star"][:256],
                  "u0": data_sol["u_star"][:256]},
                 {"t": "t0", "x": "x0"}, {"u_sol": "u0"}),
        psci.loss.MSELoss("sum"), {"u_sol": lambda out: out["u_sol"]}, name="init_mse_sup")
    val3 = psci.validate.SupervisedValidator(
        _mat_cfg(data_sol, {"t": "t_star", "x": "x_star"}, {"u_sol": "u_star"}),
        psci.loss.MSELoss("sum"), {"u_sol": lambda out: out["u_sol"]},
        {"l2": psci.metric.L2Rel()}, name="u_L2_sup")
    s3 = psci.solver.Solver(
        model_list3, {"f_mse_sup": sup3_pde, "b_mse_sup": sup3_bc, "init_mse_sup": sup3_ic},
        output_dir, psci.optimizer.Adam(lr)(model_list3),
        epochs=epochs[2], iters_per_epoch=iters_per_epoch,
        validator={"u_L2_sup": val3}, eval_during_train=False)
    s3.train()
    m3, g3 = s3.eval()
    print(f"stage3 sol L2Rel = {m3:.4e}")
    return m3


def main_cli():
    import _runner  # noqa: F401

    @psci.utils.config.main("conf/deephpms.yaml")
    def _main(cfg):
        def train(c):
            return run(
                c,
                epochs=(c.TRAIN.epochs_idn, c.TRAIN.epochs_pde, c.TRAIN.epochs_sol),
                iters_per_epoch=c.TRAIN.iters_per_epoch,
                lr=c.TRAIN.learning_rate,
                output_dir=(c.get("output_dir") or "./outputs_deephpms"),
                dataset_path=c.get_path("dataset_path"),
                dataset_sol_path=c.get_path("dataset_sol_path"),
            )

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
