"""DeepHPMs: deep hidden physics models on 1-D evolution PDEs (reference
``examples/deephpms/burgers.py`` / ``korteweg_de_vries.py`` /
``kuramoto_sivashinsky.py`` — one parametric family here, selected by
``pde=burgers|kdv|ks``).

Three MLPs: idn_net fits u(t,x) from data; pde_net learns the hidden
operator N(u, u_x, ..., u_x^(p)) such that u_t = N(...); sol_net solves the
learned PDE on a second dataset with periodic BCs. The reference's
derivative-taking input transform (``burgers.py:84-90``,
``korteweg_de_vries.py:27-40`` to third order,
``kuramoto_sivashinsky.py`` to fourth) is written TPU-natively: feature
derivatives come from nested ``jax.jvp`` on the idn/sol net — valid batched
or per-point, so the whole composed model traces into one XLA program at
every stage.

Data: ``dataset_path``/``dataset_sol_path`` .mat files (t_train/x_train/
u_train/t_star/x_star/u_star); when absent, a spectral solver generates the
same layout (FFT + RK4 for Burgers; ETDRK4, Kassam & Trefethen 2005, for the
stiff dispersive KdV / KS operators).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import ad, jacobian

T_LB, T_UB = 0.0, 10.0
X_LB, X_UB = -8.0, 8.0
NU = 0.1

# family table (reference conf/{burgers,korteweg_de_vries,kuramoto_sivashinsky}.yaml
# T_LB/T_UB/X_LB/X_UB rows; orders from each conf's MODEL.pde_net.input_keys):
#   u_t = lin(d/dx) u + N(u),  N(u) = -u u_x  for all three
PDES = {
    "burgers": dict(t=(0.0, 10.0), x=(-8.0, 8.0), order=2,
                    lin=lambda k: -NU * k**2, dt=None),
    "kdv": dict(t=(0.0, 40.0), x=(-20.0, 20.0), order=3,
                lin=lambda k: 1j * k**3, dt=1e-3),
    "ks": dict(t=(0.0, 50.0), x=(-10.0, 10.0), order=4,
               lin=lambda k: k**2 - k**4, dt=2.5e-3),
}


def spectral_etdrk4(pde: str, nx=256, nt=201, seed=0, amp=1.0):
    """Generic periodic 1-D spectral solve of u_t = lin u - u u_x via ETDRK4
    (complex contour — KdV's dispersive lin is imaginary)."""
    spec = PDES[pde]
    (t0, t1), (x0, x1) = spec["t"], spec["x"]
    L = x1 - x0
    rng = np.random.default_rng(seed)
    x = np.linspace(x0, x1, nx, endpoint=False)
    k = 2 * np.pi * np.fft.fftfreq(nx, d=L / nx)
    u = -amp * np.sin(2 * np.pi * (x - x0) / L) + 0.1 * rng.standard_normal() * np.cos(
        4 * np.pi * (x - x0) / L)

    lin = spec["lin"](k).astype(np.complex128)
    dt = spec["dt"]
    steps_total = int(round((t1 - t0) / dt))
    save_every = max(steps_total // (nt - 1), 1)

    E = np.exp(dt * lin)
    E2 = np.exp(dt * lin / 2)
    M = 32
    r = np.exp(2j * np.pi * (np.arange(1, M + 1) - 0.5) / M)  # full circle: lin may be complex
    LR = dt * lin[:, None] + r[None, :]
    Q = dt * np.mean((np.exp(LR / 2) - 1) / LR, axis=1)
    f1 = dt * np.mean((-4 - LR + np.exp(LR) * (4 - 3 * LR + LR**2)) / LR**3, axis=1)
    f2 = dt * np.mean((2 + LR + np.exp(LR) * (-2 + LR)) / LR**3, axis=1)
    f3 = dt * np.mean((-4 - 3 * LR - LR**2 + np.exp(LR) * (4 - LR)) / LR**3, axis=1)

    def N_of(v_hat):
        uu = np.real(np.fft.ifft(v_hat))
        return -0.5j * k * np.fft.fft(uu * uu)  # -u u_x = -(u^2/2)_x

    v = np.fft.fft(u)
    out = [u.copy()]
    for step in range(1, steps_total + 1):
        Nv = N_of(v)
        a = E2 * v + Q * Nv
        Na = N_of(a)
        b = E2 * v + Q * Na
        Nb = N_of(b)
        c = E2 * a + Q * (2 * Nb - Nv)
        Nc = N_of(c)
        v = E * v + Nv * f1 + 2 * (Na + Nb) * f2 + Nc * f3
        if step % save_every == 0 and len(out) < nt:
            out.append(np.real(np.fft.ifft(v)))
    while len(out) < nt:
        out.append(out[-1])
    ts = np.linspace(t0, t1, nt)
    return ts, x, np.stack(out)


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


def load_data(path, seed, n_train=10000, pde="burgers"):
    if path and osp.exists(path):
        from paddlescience_tpu.utils import reader

        return reader.load_mat_file(path, keys=None)
    rng = np.random.default_rng(seed)
    if pde == "burgers":
        ts, x, U = spectral_burgers(seed=seed, amp=1.0 + 0.2 * seed)
    else:
        ts, x, U = spectral_etdrk4(pde, seed=seed, amp=1.0 + 0.2 * seed)
    return _flatten(ts, x, U, n_train, rng)


def _normalizers(pde):
    (t_lb, t_ub), (x_lb, x_ub) = PDES[pde]["t"], PDES[pde]["x"]

    def norm_t(t):
        return 2.0 * (t - t_lb) / (t_ub - t_lb) - 1.0

    def norm_x(x):
        return 2.0 * (x - x_lb) / (x_ub - x_lb) - 1.0

    return norm_t, norm_x


def _deriv_keys(order):
    """pde_net feature names per reference conf MODEL.pde_net.input_keys:
    u itself rides under "u_x" [sic], then du_x, du_xx, ..."""
    return ["u_x"] + ["du_" + "x" * j for j in range(1, order + 1)]


def make_transform_u(pde="burgers"):
    norm_t, norm_x = _normalizers(pde)

    def transform_u(in_):
        return {"t": norm_t(in_["t"]), "x": norm_x(in_["x"])}

    return transform_u


def make_transform_f(u_model, pde="burgers"):
    """(t, x) -> (u, u_x, ..., u_x^(order)) of `u_model` via nested jvp
    (TPU-native version of reference burgers.py:84-90 at order 2,
    korteweg_de_vries.py at 3, kuramoto_sivashinsky.py at 4)."""
    import jax
    import jax.numpy as jnp

    order = PDES[pde]["order"]
    norm_t, norm_x = _normalizers(pde)

    def transform_f(in_):
        t, x = ad.unwrap(in_["t"]), ad.unwrap(in_["x"])
        key = u_model.output_keys[0]

        def u_of_x(xx):
            return u_model({"t": norm_t(t), "x": norm_x(xx)})[key]

        ones = jnp.ones_like(x)
        keys = _deriv_keys(order)
        out = {}
        fn = u_of_x
        val, d = jax.jvp(fn, (x,), (ones,))
        out[keys[0]], out[keys[1]] = val, d
        for j in range(2, order + 1):
            fn = (lambda f: lambda xx: jax.jvp(f, (xx,), (ones,))[1])(fn)
            _, d = jax.jvp(fn, (x,), (ones,))
            out[keys[j]] = d
        return out

    return transform_f


def _nth_jac(u, x, n):
    for _ in range(n):
        u = jacobian(u, x)
    return u


def _pde_loss(out, *args):
    import jax.numpy as jnp

    return {"pde": jnp.sum((out["f_pde"] - out["du_t"]) ** 2)}


def _pde_l2(out, *args):
    import jax.numpy as jnp

    return {"f_pde": jnp.linalg.norm(out["du_t"] - out["f_pde"]) / jnp.linalg.norm(out["du_t"])}


def _boundary_loss(out, *args):
    """Periodic matching of u and every provided boundary derivative
    (reference korteweg_de_vries.py:47-57 matches u, u_x, u_xx at order 3)."""
    import jax.numpy as jnp

    total = 0.0
    for k, v in out.items():
        if k == "u_sol" or k.startswith("du_"):
            n = v.shape[0] // 2
            total = total + jnp.sum((v[:n] - v[n:]) ** 2)
    return {"boundary": total}


def _mat_cfg(data, in_map, lab_map):
    return {"dataset": {
        "name": "NamedArrayDataset",
        "input": {k: data[v] for k, v in in_map.items()},
        "label": {k: data[v] for k, v in lab_map.items()},
    }, "batch_size": len(data[next(iter(in_map.values()))]),
        "iters_per_epoch": 1,
        "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}}


def run(cfg=None, epochs=(60, 60, 60), iters_per_epoch=1, lr=1e-3,
        output_dir="./outputs_deephpms", dataset_path=None, dataset_sol_path=None,
        pde="burgers"):
    psci.utils.set_random_seed(42)
    order = PDES[pde]["order"]
    data_idn = load_data(dataset_path, seed=0, pde=pde)
    data_sol = load_data(dataset_sol_path, seed=1, pde=pde)

    model_idn = psci.arch.MLP(("t", "x"), ("u_idn",), 4, 50, activation="sin")
    model_pde = psci.arch.MLP(tuple(_deriv_keys(order)), ("f_pde",), 2, 100, activation="sin",
                              rngs=psci.nn.Rngs(1))
    model_sol = psci.arch.MLP(("t", "x"), ("u_sol",), 4, 50, activation="sin",
                              rngs=psci.nn.Rngs(2))
    model_idn.register_input_transform(make_transform_u(pde))
    model_sol.register_input_transform(make_transform_u(pde))
    model_pde.register_input_transform(make_transform_f(model_idn, pde))

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
    model_pde.register_input_transform(make_transform_f(model_sol, pde))
    model_pde.freeze()
    model_list3 = psci.arch.ModelList((model_sol, model_pde))
    # periodic boundary pairs (x_lb stacked over x_ub)
    (t_lb, t_ub), (x_lb, x_ub) = PDES[pde]["t"], PDES[pde]["x"]
    nt_b = 128
    rngb = np.random.default_rng(3)
    t_b = rngb.uniform(t_lb, t_ub, (nt_b, 1)).astype("float32")
    bc_input = {"t": np.concatenate([t_b, t_b]),
                "x": np.concatenate([np.full((nt_b, 1), x_lb, "float32"),
                                     np.full((nt_b, 1), x_ub, "float32")])}
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
         # periodic matching of d^j u / dx^j, j=1..order-1 (reference
         # korteweg_de_vries.py:47-57)
         **{f"du_{'x' * j}_sol": (lambda j: lambda out: ad.unwrap(
             _nth_jac(out["u_sol"], out["x"], j)))(j)
            for j in range(1, order)}},
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
                pde=c.get("pde", "burgers"),
            )

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
