"""hPINNs: holography inverse design with hard constraints (reference
``examples/hpinns/holography.py`` + ``functions.py``; arXiv:2102.04626).

Three MLPs (E_re, E_im, epsilon) with hard-constraint transforms: periodic
Fourier features in x, a zero-Dirichlet envelope in y (``functions.py:50-91``)
and eps squashed into [1, 12]. The PML-Helmholtz residual
(``functions.py:152-235``) is penalized with the augmented Lagrangian method:
outer iterations update per-point multipliers lambda += mu * residual and
mu *= beta (``functions.py:94-133``). Objective: |E|^2 matches a square
target region. The reference's .mat collocation cloud is replaced by sampled
points; the whole three-net loss (PDE + Lagrangian + objective) compiles into
one jitted step with lambda/mu passed as device operands (no recompiles
across outer iterations).
"""

from __future__ import annotations

import numpy as np

BOX = np.array([[-2.0, -2.0], [2.0, 3.0]])
DPML = 1.0
OMEGA = 2 * np.pi
SIGMA0 = -np.log(1e-20) / (4 * DPML**3 / 3)
L_BOX = BOX + np.array([[-DPML, -DPML], [DPML, DPML]])
BETA = 2.0


def sample_points(n_obj=1500, n_pde=5000, seed=0):
    rng = np.random.default_rng(seed)
    # objective-region points first (J is evaluated there), PDE points after
    obj = np.stack([rng.uniform(-0.5, 0.5, n_obj),
                    rng.uniform(1.0, 2.0, n_obj)], 1).astype(np.float32)
    pde = np.stack([rng.uniform(L_BOX[0][0], L_BOX[1][0], n_pde),
                    rng.uniform(L_BOX[0][1], L_BOX[1][1], n_pde)], 1).astype(np.float32)
    return np.concatenate([obj, pde], 0), n_obj


def build(cfg=None, seed=42):
    import jax
    import jax.numpy as jnp
    import optax

    import paddlescience_tpu as psci

    psci.utils.set_random_seed(seed)
    in_keys = tuple(f"x_cos_{t}" for t in range(1, 7)) + tuple(
        f"x_sin_{t}" for t in range(1, 7)) + ("y", "y_cos_1", "y_sin_1")
    hidden = cfg.MODEL.hidden_size if cfg else 48
    layers = cfg.MODEL.num_layers if cfg else 4
    net_re = psci.arch.MLP(in_keys, ("e_re",), layers, hidden, activation="tanh")
    net_im = psci.arch.MLP(in_keys, ("e_im",), layers, hidden, activation="tanh")
    net_eps = psci.arch.MLP(in_keys, ("eps",), layers, hidden, activation="tanh")
    params = [m.param_tree() for m in (net_re, net_im, net_eps)]

    pts, bound = sample_points(
        n_obj=cfg.TRAIN.num_opt_points if cfg else 1500,
        n_pde=cfg.TRAIN.num_pde_points if cfg else 5000, seed=seed)
    xy = np.asarray(pts)

    P = BOX[1][0] - BOX[0][0] + 2 * DPML
    w = 2 * np.pi / P

    def feats(v):
        """hard-constraint input transform (functions.py:50-64), per point."""
        x, y = v[0], v[1]
        d = {}
        for t in range(1, 7):
            d[f"x_cos_{t}"] = jnp.cos(t * w * x)[None]
            d[f"x_sin_{t}"] = jnp.sin(t * w * x)[None]
        d["y"] = y[None]
        d["y_cos_1"] = jnp.cos(OMEGA * y)[None]
        d["y_sin_1"] = jnp.sin(OMEGA * y)[None]
        return {k: val[None] for k, val in d.items()}  # batch dim 1

    a_lo, b_hi = BOX[0][1] - DPML, BOX[1][1] + DPML

    def fields_pt(ps, v):
        """E_re, E_im with the zero-Dirichlet envelope; eps in [1,12]."""
        f = feats(v)
        env = (1 - jnp.exp(a_lo - v[1])) * (1 - jnp.exp(v[1] - b_hi))
        e_re = env * net_re.apply(ps[0], f)["e_re"][0, 0]
        e_im = env * net_im.apply(ps[1], f)["e_im"][0, 0]
        eps = jax.nn.sigmoid(net_eps.apply(ps[2], f)["eps"][0, 0]) * 11 + 1
        return e_re, e_im, eps

    def _sigma1(d):
        return SIGMA0 * d**2 * (d > 0)

    def _sigma2(d):
        return 2 * SIGMA0 * d * (d > 0)

    def pml_coefs(x, y):
        sx = _sigma1(BOX[0][0] - x) + _sigma1(x - BOX[1][0])
        ab1 = 1.0 / (1 + 1j / OMEGA * sx) ** 2
        dsx = -_sigma2(BOX[0][0] - x) + _sigma2(x - BOX[1][0])
        ab2 = -1j / OMEGA * dsx * ab1 / (1 + 1j / OMEGA * sx)
        sy = _sigma1(BOX[0][1] - y) + _sigma1(y - BOX[1][1])
        ab3 = 1.0 / (1 + 1j / OMEGA * sy) ** 2
        dsy = -_sigma2(BOX[0][1] - y) + _sigma2(y - BOX[1][1])
        ab4 = -1j / OMEGA * dsy * ab3 / (1 + 1j / OMEGA * sy)
        return (ab1.real, ab1.imag, ab2.real, ab2.imag,
                ab3.real, ab3.imag, ab4.real, ab4.imag)

    def obj_J(y):
        h = 0.2
        yy = y + 1.5
        return 1 / (h * np.pi**0.5) * jnp.exp(-((yy / h) ** 2)) * (jnp.abs(yy) < 0.5)

    def residual_pt(ps, v):
        """PML-Helmholtz residual (functions.py:190-235) at one point."""
        def e_re_fn(u):
            return fields_pt(ps, u)[0]

        def e_im_fn(u):
            return fields_pt(ps, u)[1]

        def d12(f, j):
            tang = jnp.zeros(2).at[j].set(1.0)
            d1 = lambda u: jax.jvp(f, (u,), (tang,))[1]
            return d1(v), jax.jvp(d1, (v,), (tang,))[1]

        e_re, e_im, eps = fields_pt(ps, v)
        x, y = v[0], v[1]
        in_slab = (y < 0) & (y > -1)
        eps = jnp.where(in_slab, eps, 1.0)
        dre_x, dre_xx = d12(e_re_fn, 0)
        dre_y, dre_yy = d12(e_re_fn, 1)
        dim_x, dim_xx = d12(e_im_fn, 0)
        dim_y, dim_yy = d12(e_im_fn, 1)
        a1, b1, a2, b2, a3, b3, a4, b4 = pml_coefs(x, y)
        loss_re = ((a1 * dre_xx + a2 * dre_x + a3 * dre_yy + a4 * dre_y) / OMEGA
                   - (b1 * dim_xx + b2 * dim_x + b3 * dim_yy + b4 * dim_y) / OMEGA
                   + eps * OMEGA * e_re)
        loss_im = ((a1 * dim_xx + a2 * dim_x + a3 * dim_yy + a4 * dim_y) / OMEGA
                   + (b1 * dre_xx + b2 * dre_x + b3 * dre_yy + b4 * dre_y) / OMEGA
                   + eps * OMEGA * e_im + obj_J(y))
        return loss_re, loss_im

    xy_j = jnp.asarray(xy)

    def all_residuals(ps):
        return jax.vmap(lambda v: residual_pt(ps, v))(xy_j[bound:])

    def loss_fn(ps, lam_re, lam_im, mu):
        res_re, res_im = all_residuals(ps)
        loss_eqs = jnp.mean(res_re**2) + jnp.mean(res_im**2)
        loss_lag = jnp.mean(res_re * lam_re) + jnp.mean(res_im * lam_im)
        # objective: |E|^2 matches the indicator of [-0.5,0.5]x[1,2]
        e = jax.vmap(lambda v: fields_pt(ps, v))(xy_j[:bound])
        e_re, e_im = e[0], e[1]
        x_o, y_o = xy_j[:bound, 0], xy_j[:bound, 1]
        f1 = ((x_o + 0.5) * (0.5 - x_o) > 0).astype(jnp.float32)
        f2 = ((y_o - 1) * (2 - y_o) > 0).astype(jnp.float32)
        jdiff = e_re**2 + e_im**2 - f1 * f2
        loss_obj = jnp.mean(jdiff**2)
        return 0.5 * mu * loss_eqs + loss_lag + loss_obj, (loss_eqs, loss_obj)

    tx = optax.adam(cfg.TRAIN.learning_rate if cfg else 1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(ps, opt, lam_re, lam_im, mu):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(ps, lam_re, lam_im, mu)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(ps, upd), opt, loss, aux

    residuals_jit = jax.jit(all_residuals)
    return params, opt, step, residuals_jit, bound, (net_re, net_im, net_eps), xy_j, loss_fn


def train(cfg):
    import jax.numpy as jnp

    params, opt, step, residuals_jit, bound, nets, xy, loss_fn = build(cfg, seed=cfg.seed)
    n_pde = xy.shape[0] - bound
    lam_re = jnp.zeros((n_pde,))
    lam_im = jnp.zeros((n_pde,))
    mu = 2.0
    aug_lag = cfg.TRAIN.train_mode == "aug_lag"
    inner = cfg.TRAIN.iters_per_epoch * cfg.TRAIN.epochs
    outer = cfg.TRAIN.n_lagrangian_updates if aug_lag else 1

    for k in range(outer):
        for it in range(inner):
            params, opt, loss, (loss_eqs, loss_obj) = step(params, opt, lam_re, lam_im, mu)
            g = k * inner + it + 1
            if g % max(cfg.log_freq, 1) == 0:
                print(f"[hpinns][{g}/{outer * inner}] loss={float(loss):.5f} "
                      f"pde={float(loss_eqs):.5f} obj={float(loss_obj):.5f}")
        if aug_lag and k < outer - 1:
            res_re, res_im = residuals_jit(params)
            lam_re = lam_re + mu * res_re
            lam_im = lam_im + mu * res_im
            mu = mu * BETA
            print(f"[hpinns] lagrangian update {k + 1}: mu -> {mu}")

    res_re, res_im = residuals_jit(params)
    pde_mse = float(jnp.mean(res_re**2) + jnp.mean(res_im**2))
    _, (loss_eqs, loss_obj) = loss_fn(params, lam_re, lam_im, mu)
    print(f"hPINNs final: pde residual MSE = {pde_mse:.4e}, objective = {float(loss_obj):.4e}")
    if cfg.output_dir:
        from paddlescience_tpu.utils import save_load

        save_load.save_checkpoint(
            {"params": {n: p for n, p in zip(("re", "im", "eps"), params)}},
            cfg.output_dir, "latest")
    return pde_mse


def evaluate(cfg):
    import jax.numpy as jnp

    from paddlescience_tpu.utils import save_load

    params, opt, step, residuals_jit, bound, nets, xy, loss_fn = build(cfg, seed=cfg.seed)
    path = cfg.get_path("EVAL.pretrained_model_path")
    if path:
        restored = save_load.load_pretrain(path)
        params = [restored[n] for n in ("re", "im", "eps")]
    res_re, res_im = residuals_jit(params)
    pde_mse = float(jnp.mean(res_re**2) + jnp.mean(res_im**2))
    print(f"hPINNs eval: pde residual MSE = {pde_mse:.4e}")
    return pde_mse


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/hpinns.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(cfg, train=train, evaluate=evaluate)

    return _main()


if __name__ == "__main__":
    main_cli()
