"""DeepHPMs on 2-D Navier-Stokes vorticity transport (reference
``examples/deephpms/navier_stokes.py``): two stages.

The identification MLP fits vorticity w(t,x,y) from flow data; the pde net
learns the hidden transport operator N such that w_t = N(u, v, w, w_x, w_y,
w_xx, w_xy, w_yy) — u, v ride through from the dataset (observed
velocities), while the w-derivative features come from nested ``jax.jvp``
on the idn net (the reference's jacobian/hessian input transform,
``navier_stokes.py:68-89``), so each stage traces into one XLA program.

Data: the reference's cylinder_nektar_wake.mat layout when present; when
absent, an in-repo pseudo-spectral 2-D NS solver (vorticity formulation,
2/3-dealiased RK4, decaying turbulence on a periodic box) generates
(t, x, y, u, v, w) samples with the same keys.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci
from deephpms import _mat_cfg  # shared dataset-config shape across variants
from paddlescience_tpu.autodiff import ad, jacobian

NU = 1e-2
T_LB, T_UB = 0.0, 2.0
BOX = 2 * np.pi
FEATURES = ("u", "v", "w", "dw_x", "dw_y", "dw_xx", "dw_xy", "dw_yy")


def spectral_ns2d(nx=96, nt=41, nu=NU, seed=0):
    """Periodic 2-D NS, vorticity form: w_t + u w_x + v w_y = nu lap(w)."""
    rng = np.random.default_rng(seed)
    k = np.fft.fftfreq(nx, d=1.0 / nx) * (2 * np.pi / BOX)
    KX, KY = np.meshgrid(k, k, indexing="ij")
    K2 = KX**2 + KY**2
    K2i = np.where(K2 == 0, 1.0, K2)
    # smooth random initial vorticity, low-wavenumber band
    wh = (rng.standard_normal((nx, nx)) + 1j * rng.standard_normal((nx, nx)))
    wh *= np.exp(-((np.sqrt(K2) - 3.0) ** 2))
    w = np.real(np.fft.ifft2(wh))
    w = 2.0 * w / np.abs(w).max()
    dealias = (np.abs(KX) < k.max() * 2 / 3) & (np.abs(KY) < k.max() * 2 / 3)

    def rhs(w):
        wh = np.fft.fft2(w)
        psih = wh / K2i
        u = np.real(np.fft.ifft2(1j * KY * psih))
        v = np.real(np.fft.ifft2(-1j * KX * psih))
        wx = np.real(np.fft.ifft2(1j * KX * wh))
        wy = np.real(np.fft.ifft2(1j * KY * wh))
        adv = np.fft.fft2(u * wx + v * wy) * dealias
        return np.real(np.fft.ifft2(-adv - nu * K2 * wh)), u, v

    ts = np.linspace(T_LB, T_UB, nt)
    sub = 40
    dt = (ts[1] - ts[0]) / sub
    snaps = []
    for it in range(nt):
        _, u, v = rhs(w)
        snaps.append((w.copy(), u, v))
        if it == nt - 1:
            break
        for _ in range(sub):
            k1, _, _ = rhs(w)
            k2, _, _ = rhs(w + 0.5 * dt * k1)
            k3, _, _ = rhs(w + 0.5 * dt * k2)
            k4, _, _ = rhs(w + dt * k3)
            w = w + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    x = np.linspace(0, BOX, nx, endpoint=False)
    return ts, x, snaps


def load_data(path, seed=0, n_train=10000, nx=96, nt=41):
    if path and osp.exists(path):
        from paddlescience_tpu.utils import reader

        return reader.load_mat_file(path, keys=None)
    rng = np.random.default_rng(seed)
    ts, x, snaps = spectral_ns2d(nx=nx, nt=nt, seed=seed)
    nx = len(x)
    T = np.repeat(ts, nx * nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    XX = np.tile(X.ravel(), len(ts))
    YY = np.tile(Y.ravel(), len(ts))
    W = np.concatenate([s[0].ravel() for s in snaps])
    U = np.concatenate([s[1].ravel() for s in snaps])
    V = np.concatenate([s[2].ravel() for s in snaps])
    col = lambda a: a.reshape(-1, 1).astype("float32")
    full = dict(t_star=col(T), x_star=col(XX), y_star=col(YY),
                u_star=col(U), v_star=col(V), w_star=col(W))
    idx = rng.choice(len(T), min(n_train, len(T)), replace=False)
    full.update({k.replace("_star", "_train"): full[k][idx] for k in list(full)})
    return full


def _norm(a, lb, ub):
    return 2.0 * (a - lb) / (ub - lb) - 1.0


def transform_w(in_):
    return {"t": _norm(in_["t"], T_LB, T_UB), "x": _norm(in_["x"], 0.0, BOX),
            "y": _norm(in_["y"], 0.0, BOX)}


def make_transform_f(w_model):
    """(t,x,y,u,v) -> (u, v, w, w_x, w_y, w_xx, w_xy, w_yy) via nested jvp
    (reference navier_stokes.py:68-89)."""
    import jax
    import jax.numpy as jnp

    def transform_f(in_):
        t = ad.unwrap(in_["t"])
        x, y = ad.unwrap(in_["x"]), ad.unwrap(in_["y"])
        key = w_model.output_keys[0]

        def w_of(xx, yy):
            return w_model({"t": _norm(t, T_LB, T_UB), "x": _norm(xx, 0.0, BOX),
                            "y": _norm(yy, 0.0, BOX)})[key]

        ox, oy = jnp.ones_like(x), jnp.ones_like(y)
        w_x_of = lambda xx, yy: jax.jvp(lambda a: w_of(a, yy), (xx,), (ox,))[1]
        w_y_of = lambda xx, yy: jax.jvp(lambda b: w_of(xx, b), (yy,), (oy,))[1]
        w = w_of(x, y)
        w_x = w_x_of(x, y)
        w_y = w_y_of(x, y)
        _, w_xx = jax.jvp(lambda a: w_x_of(a, y), (x,), (ox,))
        _, w_yy = jax.jvp(lambda b: w_y_of(x, b), (y,), (oy,))
        _, w_xy = jax.jvp(lambda b: w_x_of(x, b), (y,), (oy,))
        return {"u": ad.unwrap(in_["u"]), "v": ad.unwrap(in_["v"]), "w": w,
                "dw_x": w_x, "dw_y": w_y, "dw_xx": w_xx, "dw_xy": w_xy,
                "dw_yy": w_yy}

    return transform_f


def _pde_loss(out, *args):
    import jax.numpy as jnp

    return {"pde": jnp.sum((out["f_pde"] - out["dw_t"]) ** 2)}


def _pde_l2(out, *args):
    import jax.numpy as jnp

    return {"f_pde": jnp.linalg.norm(out["dw_t"] - out["f_pde"])
            / jnp.linalg.norm(out["dw_t"])}


def run(cfg=None, epochs=(60, 60), iters_per_epoch=1, lr=1e-3,
        output_dir="./outputs_deephpms_ns", dataset_path=None, nx=96, nt=41,
        n_eval=None):
    psci.utils.set_random_seed(42)
    data = load_data(dataset_path, seed=0, nx=nx, nt=nt)
    if n_eval:
        rng = np.random.default_rng(7)
        sel = rng.choice(len(data["t_star"]), int(n_eval), replace=False)
        for k in list(data):
            if k.endswith("_star"):
                data[k] = data[k][sel]
    in_map = {"t": "t_train", "x": "x_train", "y": "y_train",
              "u": "u_train", "v": "v_train"}
    in_map_star = {k: v.replace("_train", "_star") for k, v in in_map.items()}

    model_idn = psci.arch.MLP(("t", "x", "y"), ("w_idn",), 4, 200, activation="sin")
    model_pde = psci.arch.MLP(FEATURES, ("f_pde",), 2, 100, activation="sin",
                              rngs=psci.nn.Rngs(1))
    model_idn.register_input_transform(transform_w)
    model_pde.register_input_transform(make_transform_f(model_idn))

    # ---- stage 1: identification net fits w(t,x,y) ------------------------
    sup1 = psci.constraint.SupervisedConstraint(
        _mat_cfg(data, in_map, {"w_idn": "w_train"}),
        psci.loss.MSELoss("sum"), {"w_idn": lambda out: out["w_idn"]}, name="w_mse_sup")
    val1 = psci.validate.SupervisedValidator(
        _mat_cfg(data, in_map_star, {"w_idn": "w_star"}),
        psci.loss.MSELoss("sum"), {"w_idn": lambda out: out["w_idn"]},
        {"l2": psci.metric.L2Rel()}, name="w_L2_sup")
    s1 = psci.solver.Solver(
        model_idn, {"w_mse_sup": sup1}, output_dir, psci.optimizer.Adam(lr)(model_idn),
        epochs=epochs[0], iters_per_epoch=iters_per_epoch,
        validator={"w_L2_sup": val1}, eval_during_train=False)
    s1.train()
    m1, _ = s1.eval()
    print(f"stage1 idn L2Rel = {m1:.4e}")

    # ---- stage 2: pde net learns w_t = N(u, v, w, grad w, hess w) ---------
    models2 = psci.arch.ModelList((model_idn, model_pde))
    model_idn.freeze()
    expr2 = {"dw_t": lambda out: ad.unwrap(jacobian(out["w_idn"], out["t"])),
             "f_pde": lambda out: ad.unwrap(out["f_pde"])}
    sup2 = psci.constraint.SupervisedConstraint(
        _mat_cfg(data, in_map, {"dw_t": "t_train"}),
        psci.loss.FunctionalLoss(_pde_loss), expr2, name="f_mse_sup")
    val2 = psci.validate.SupervisedValidator(
        _mat_cfg(data, in_map_star, {"dw_t": "t_star"}),
        psci.loss.FunctionalLoss(_pde_loss), expr2,
        {"l2": psci.metric.FunctionalMetric(_pde_l2)}, name="f_L2_sup")
    s2 = psci.solver.Solver(
        models2, {"f_mse_sup": sup2}, output_dir, psci.optimizer.Adam(lr)(models2),
        epochs=epochs[1], iters_per_epoch=iters_per_epoch,
        validator={"f_L2_sup": val2}, eval_during_train=False)
    s2.train()
    m2, _ = s2.eval()
    print(f"stage2 pde L2Rel = {m2:.4e}")
    return m2


def main_cli():
    @psci.utils.config.main("conf/deephpms_ns.yaml")
    def _main(cfg):
        def train(c):
            return run(
                c,
                epochs=(c.TRAIN.epochs_idn, c.TRAIN.epochs_pde),
                iters_per_epoch=c.TRAIN.iters_per_epoch,
                lr=c.TRAIN.learning_rate,
                output_dir=(c.get("output_dir") or "./outputs_deephpms_ns"),
                dataset_path=c.get_path("dataset_path"),
                nx=c.TRAIN.get("nx", 96), nt=c.TRAIN.get("nt", 41),
                n_eval=c.TRAIN.get("n_eval", None),
            )

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
