"""DeepHPMs on the nonlinear Schrodinger equation (reference
``examples/deephpms/schrodinger.py``): two-component hidden physics.

h = u + iv solves i h_t + 0.5 h_xx + |h|^2 h = 0 on t in [0, pi/2],
x in [-5, 5]. Two identification MLPs fit u and v; two pde nets learn the
hidden operators f, g with features (u, v, u_x, v_x, u_xx, v_xx) such that
u_t = f(...) and v_t = g(...) (reference schrodinger.py:101-121); stage 3
re-trains the identification nets as solution nets of the learned system
with periodic matching of u, v, u_x, v_x (reference schrodinger.py:49-66).
Feature derivatives come from nested ``jax.jvp`` so every stage traces into
one XLA program. Data: NLS.mat layout when present, else an in-repo
split-step Fourier solver (Strang splitting, 2 sech(x) bright-soliton IC).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci
from deephpms import _mat_cfg  # shared dataset-config shape across variants
from paddlescience_tpu.autodiff import ad, jacobian

T_LB, T_UB = 0.0, float(np.pi / 2)
X_LB, X_UB = -5.0, 5.0
FEATURES = ("u", "v", "du_x", "dv_x", "du_xx", "dv_xx")


def split_step_nls(nx=256, nt=201, seed=0, amp=2.0):
    """i h_t + 0.5 h_xx + |h|^2 h = 0, periodic split-step Fourier."""
    rng = np.random.default_rng(seed)
    x = np.linspace(X_LB, X_UB, nx, endpoint=False)
    L = X_UB - X_LB
    k = 2 * np.pi * np.fft.fftfreq(nx, d=L / nx)
    h = amp / np.cosh(x) * (1.0 + 0.05 * rng.standard_normal() * np.cos(2 * np.pi * x / L))
    h = h.astype(np.complex128)
    ts = np.linspace(T_LB, T_UB, nt)
    sub = 50
    dt = (ts[1] - ts[0]) / sub
    lin_half = np.exp(-0.25j * k**2 * dt)  # half linear step: h_t = 0.5i h_xx
    snaps = [h.copy()]
    for _ in range(nt - 1):
        for _ in range(sub):
            h = np.fft.ifft(lin_half * np.fft.fft(h))
            h = h * np.exp(1j * np.abs(h) ** 2 * dt)
            h = np.fft.ifft(lin_half * np.fft.fft(h))
        snaps.append(h.copy())
    return ts, x, np.stack(snaps)


def load_data(path, seed, n_train=10000):
    if path and osp.exists(path):
        from paddlescience_tpu.utils import reader

        return reader.load_mat_file(path, keys=None)
    rng = np.random.default_rng(seed)
    ts, x, H = split_step_nls(seed=seed)
    T, X = np.meshgrid(ts, x, indexing="ij")
    t_star = T.reshape(-1, 1).astype("float32")
    x_star = X.reshape(-1, 1).astype("float32")
    u_star = np.real(H).reshape(-1, 1).astype("float32")
    v_star = np.imag(H).reshape(-1, 1).astype("float32")
    idx = rng.choice(len(t_star), n_train, replace=False)
    return dict(t_train=t_star[idx], x_train=x_star[idx],
                u_train=u_star[idx], v_train=v_star[idx],
                t_star=t_star, x_star=x_star, u_star=u_star, v_star=v_star)


def _norm(t, lb, ub):
    return 2.0 * (t - lb) / (ub - lb) - 1.0


def transform_uv(in_):
    return {"t": _norm(in_["t"], T_LB, T_UB), "x": _norm(in_["x"], X_LB, X_UB)}


def make_transform_fg(u_model, v_model):
    """(t, x) -> (u, v, u_x, v_x, u_xx, v_xx) via nested jvp (TPU-native
    version of reference schrodinger.py:101-121)."""
    import jax

    def transform_fg(in_):
        t, x = ad.unwrap(in_["t"]), ad.unwrap(in_["x"])
        out = {}
        for name, model in (("u", u_model), ("v", v_model)):
            key = model.output_keys[0]

            def w_of_x(xx, model=model, key=key):
                return model({"t": _norm(t, T_LB, T_UB), "x": _norm(xx, X_LB, X_UB)})[key]

            ones = jax.numpy.ones_like(x)
            val, d1 = jax.jvp(w_of_x, (x,), (ones,))
            _, d2 = jax.jvp(lambda xx: jax.jvp(w_of_x, (xx,), (ones,))[1], (x,), (ones,))
            out[name], out[f"d{name}_x"], out[f"d{name}_xx"] = val, d1, d2
        return out

    return transform_fg


def _pde_loss(out, *args):
    import jax.numpy as jnp

    return {"pde": jnp.sum((out["f_pde"] - out["du_t"]) ** 2)
            + jnp.sum((out["g_pde"] - out["dv_t"]) ** 2)}


def _pde_l2(out, *args):
    import jax.numpy as jnp

    return {"f_pde": jnp.linalg.norm(out["du_t"] - out["f_pde"]) / jnp.linalg.norm(out["du_t"]),
            "g_pde": jnp.linalg.norm(out["dv_t"] - out["g_pde"]) / jnp.linalg.norm(out["dv_t"])}


def _boundary_loss(out, *args):
    """Periodic matching of u, v, u_x, v_x (reference schrodinger.py:49-66)."""
    import jax.numpy as jnp

    total = 0.0
    for k, v in out.items():
        n = v.shape[0] // 2
        total = total + jnp.sum((v[:n] - v[n:]) ** 2)
    return {"boundary": total}


def _uv_l2(out, label):
    import jax.numpy as jnp

    pred = jnp.sqrt(out["u_idn"] ** 2 + out["v_idn"] ** 2)
    true = jnp.sqrt(label["u_idn"] ** 2 + label["v_idn"] ** 2)
    return {"uv_sol": jnp.linalg.norm(true - pred) / jnp.linalg.norm(true)}


def run(cfg=None, epochs=(60, 60, 60), iters_per_epoch=1, lr=1e-3,
        output_dir="./outputs_deephpms_schrodinger", dataset_path=None,
        dataset_sol_path=None):
    psci.utils.set_random_seed(42)
    data_idn = load_data(dataset_path, seed=0)
    data_sol = load_data(dataset_sol_path, seed=1) if dataset_sol_path else data_idn

    model_u = psci.arch.MLP(("t", "x"), ("u_idn",), 4, 50, activation="sin")
    model_v = psci.arch.MLP(("t", "x"), ("v_idn",), 4, 50, activation="sin",
                            rngs=psci.nn.Rngs(1))
    model_f = psci.arch.MLP(FEATURES, ("f_pde",), 2, 100, activation="sin",
                            rngs=psci.nn.Rngs(2))
    model_g = psci.arch.MLP(FEATURES, ("g_pde",), 2, 100, activation="sin",
                            rngs=psci.nn.Rngs(3))
    model_u.register_input_transform(transform_uv)
    model_v.register_input_transform(transform_uv)
    fg_transform = make_transform_fg(model_u, model_v)
    model_f.register_input_transform(fg_transform)
    model_g.register_input_transform(fg_transform)

    # ---- stage 1: identification nets fit u(t,x), v(t,x) ------------------
    models1 = psci.arch.ModelList((model_u, model_v))
    expr_uv = {k: (lambda kk: lambda out: out[kk])(k) for k in ("u_idn", "v_idn")}
    sup1 = psci.constraint.SupervisedConstraint(
        _mat_cfg(data_idn, {"t": "t_train", "x": "x_train"},
                 {"u_idn": "u_train", "v_idn": "v_train"}),
        psci.loss.MSELoss("sum"), expr_uv, name="uv_mse_sup")
    val1 = psci.validate.SupervisedValidator(
        _mat_cfg(data_idn, {"t": "t_star", "x": "x_star"},
                 {"u_idn": "u_star", "v_idn": "v_star"}),
        psci.loss.MSELoss("sum"), expr_uv,
        {"l2": psci.metric.L2Rel()}, name="uv_L2_sup")
    s1 = psci.solver.Solver(
        models1, {"uv_mse_sup": sup1}, output_dir, psci.optimizer.Adam(lr)(models1),
        epochs=epochs[0], iters_per_epoch=iters_per_epoch,
        validator={"uv_L2_sup": val1}, eval_during_train=False)
    s1.train()
    m1, _ = s1.eval()
    print(f"stage1 idn L2Rel = {m1:.4e}")

    # ---- stage 2: pde nets learn u_t = f(...), v_t = g(...) ---------------
    models2 = psci.arch.ModelList((model_u, model_v, model_f, model_g))
    model_u.freeze()
    model_v.freeze()
    expr2 = {"du_t": lambda out: ad.unwrap(jacobian(out["u_idn"], out["t"])),
             "dv_t": lambda out: ad.unwrap(jacobian(out["v_idn"], out["t"])),
             "f_pde": lambda out: ad.unwrap(out["f_pde"]),
             "g_pde": lambda out: ad.unwrap(out["g_pde"])}
    sup2 = psci.constraint.SupervisedConstraint(
        _mat_cfg(data_idn, {"t": "t_train", "x": "x_train"}, {"du_t": "t_train"}),
        psci.loss.FunctionalLoss(_pde_loss), expr2, name="fg_mse_sup")
    val2 = psci.validate.SupervisedValidator(
        _mat_cfg(data_idn, {"t": "t_star", "x": "x_star"}, {"du_t": "t_star"}),
        psci.loss.FunctionalLoss(_pde_loss), expr2,
        {"l2": psci.metric.FunctionalMetric(_pde_l2)}, name="fg_L2_sup")
    s2 = psci.solver.Solver(
        models2, {"fg_mse_sup": sup2}, output_dir, psci.optimizer.Adam(lr)(models2),
        epochs=epochs[1], iters_per_epoch=iters_per_epoch,
        validator={"fg_L2_sup": val2}, eval_during_train=False)
    s2.train()
    m2, _ = s2.eval()
    print(f"stage2 pde L2Rel = {m2:.4e}")

    # ---- stage 3: solution nets solve the learned system ------------------
    # (reference re-trains the idn nets against f/g on the sol dataset)
    model_u.unfreeze()
    model_v.unfreeze()
    model_f.freeze()
    model_g.freeze()
    models3 = psci.arch.ModelList((model_u, model_v, model_f, model_g))
    nt_b = 128
    rngb = np.random.default_rng(3)
    t_b = rngb.uniform(T_LB, T_UB, (nt_b, 1)).astype("float32")
    bc_input = {"t": np.concatenate([t_b, t_b]),
                "x": np.concatenate([np.full((nt_b, 1), X_LB, "float32"),
                                     np.full((nt_b, 1), X_UB, "float32")])}
    sup3_pde = psci.constraint.SupervisedConstraint(
        _mat_cfg(data_sol, {"t": "t_train", "x": "x_train"}, {"du_t": "t_train"}),
        psci.loss.FunctionalLoss(_pde_loss), expr2, name="fg_mse_sup")
    sup3_bc = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset", "input": bc_input,
                     "label": {"boundary": np.zeros((2 * nt_b, 1), "float32")}},
         "batch_size": 2 * nt_b, "iters_per_epoch": 1,
         "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.FunctionalLoss(_boundary_loss),
        {"u_sol": lambda out: ad.unwrap(out["u_idn"]),
         "v_sol": lambda out: ad.unwrap(out["v_idn"]),
         "du_x_sol": lambda out: ad.unwrap(jacobian(out["u_idn"], out["x"])),
         "dv_x_sol": lambda out: ad.unwrap(jacobian(out["v_idn"], out["x"]))},
        name="b_mse_sup")
    n0 = 256
    sup3_ic = psci.constraint.SupervisedConstraint(
        _mat_cfg({**data_sol,
                  "t0": np.zeros_like(data_sol["x_star"][:n0]),
                  "x0": data_sol["x_star"][:n0],
                  "u0": data_sol["u_star"][:n0],
                  "v0": data_sol["v_star"][:n0]},
                 {"t": "t0", "x": "x0"}, {"u_idn": "u0", "v_idn": "v0"}),
        psci.loss.MSELoss("sum"), expr_uv, name="init_mse_sup")
    val3 = psci.validate.SupervisedValidator(
        _mat_cfg(data_sol, {"t": "t_star", "x": "x_star"},
                 {"u_idn": "u_star", "v_idn": "v_star"}),
        psci.loss.MSELoss("sum"), expr_uv,
        {"l2": psci.metric.FunctionalMetric(_uv_l2)}, name="uv_sol_L2")
    s3 = psci.solver.Solver(
        models3, {"fg_mse_sup": sup3_pde, "b_mse_sup": sup3_bc, "init_mse_sup": sup3_ic},
        output_dir, psci.optimizer.Adam(lr)(models3),
        epochs=epochs[2], iters_per_epoch=iters_per_epoch,
        validator={"uv_sol_L2": val3}, eval_during_train=False)
    s3.train()
    m3, _ = s3.eval()
    print(f"stage3 sol |h| L2Rel = {m3:.4e}")
    return m3


def main_cli():
    @psci.utils.config.main("conf/deephpms_schrodinger.yaml")
    def _main(cfg):
        def train(c):
            return run(
                c,
                epochs=(c.TRAIN.epochs_idn, c.TRAIN.epochs_pde, c.TRAIN.epochs_sol),
                iters_per_epoch=c.TRAIN.iters_per_epoch,
                lr=c.TRAIN.learning_rate,
                output_dir=(c.get("output_dir") or "./outputs_deephpms_schrodinger"),
                dataset_path=c.get_path("dataset_path"),
                dataset_sol_path=c.get_path("dataset_sol_path"),
            )

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
