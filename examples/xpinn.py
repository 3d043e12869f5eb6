"""XPINN: extended PINN with domain decomposition (reference
``examples/xpinn/xpinn.py``).

Poisson equation del^2 u = e^x + e^y (exact solution u = e^x + e^y) on
[-1,1]^2 split into three subdomains (two vertical interfaces), one MLP per
subdomain. The composite loss follows the reference ``_xpinn_loss``
(``xpinn.py:33-128``): data mismatch on the outer boundary (w=20), PDE
residual per subdomain (w=1), interface solution-average continuity (w=20)
and interface residual continuity (w=1). The reference's .mat point cloud is
replaced by sampled points; all three subnets + the composite loss compile
into ONE jitted train step (TPU-native: the reference dispatches 3 models
and ~10 paddle.grad chains per step in Python).
"""

from __future__ import annotations

import numpy as np


def exact_u(x, y):
    return np.exp(x) + np.exp(y)


def sample_points(n_boundary=200, n_res=(2000, 900, 900), n_iface=100, seed=0):
    rng = np.random.default_rng(seed)
    # subdomains: x < -1/3 | -1/3 <= x <= 1/3 | x > 1/3, interfaces at x = ±1/3
    def in_strip(lo, hi, n):
        return np.stack([rng.uniform(lo, hi, n), rng.uniform(-1, 1, n)], 1).astype(np.float32)

    res1 = in_strip(-1 / 3, 1 / 3, n_res[0])
    res2 = in_strip(-1.0, -1 / 3, n_res[1])
    res3 = in_strip(1 / 3, 1.0, n_res[2])
    # outer boundary of the full square
    t = rng.uniform(-1, 1, n_boundary).astype(np.float32)
    side = rng.integers(0, 4, n_boundary)
    bx = np.where(side == 0, -1.0, np.where(side == 1, 1.0, t)).astype(np.float32)
    by = np.where(side == 2, -1.0, np.where(side == 3, 1.0, t)).astype(np.float32)
    boundary = np.stack([bx, by], 1)
    i1 = np.stack([np.full(n_iface, -1 / 3, np.float32), rng.uniform(-1, 1, n_iface).astype(np.float32)], 1)
    i2 = np.stack([np.full(n_iface, 1 / 3, np.float32), rng.uniform(-1, 1, n_iface).astype(np.float32)], 1)
    return boundary, (res1, res2, res3), (i1, i2)


def build(cfg=None, seed=42):
    import jax
    import jax.numpy as jnp
    import optax

    import paddlescience_tpu as psci

    psci.utils.set_random_seed(seed)
    nets = [psci.arch.MLP(("x", "y"), ("u",), 4, 20, activation="tanh") for _ in range(3)]
    params = [m.param_tree() for m in nets]

    boundary, (res1, res2, res3), (i1, i2) = sample_points(
        n_boundary=cfg.TRAIN.num_boundary_points if cfg else 200,
        n_res=(
            (cfg.TRAIN.num_residual1_points, cfg.TRAIN.num_residual2_points,
             cfg.TRAIN.num_residual3_points) if cfg else (2000, 900, 900)),
        n_iface=cfg.TRAIN.num_interface if cfg else 100,
    )
    data = dict(
        boundary=jnp.asarray(boundary),
        boundary_u=jnp.asarray(exact_u(boundary[:, :1], boundary[:, 1:])),
        res=[jnp.asarray(r) for r in (res1, res2, res3)],
        iface=[jnp.asarray(i) for i in (i1, i2)],
    )

    def net_apply(p, net, xy):
        return net.apply(p, {"x": xy[:, :1], "y": xy[:, 1:]})["u"]

    def residual(p, net, xy):
        """del^2 u - (e^x + e^y), via forward-over-forward per coordinate."""
        def u_pt(v):
            out = net.apply(p, {"x": v[:1][None], "y": v[1:][None]})["u"]
            return out[0, 0]

        def d2(v, j):
            tang = jnp.zeros(2).at[j].set(1.0)
            g = lambda w: jax.jvp(u_pt, (w,), (tang,))[1]
            return jax.jvp(g, (v,), (tang,))[1]

        lap = jax.vmap(lambda v: d2(v, 0) + d2(v, 1))(xy)
        return lap[:, None] - (jnp.exp(xy[:, :1]) + jnp.exp(xy[:, 1:]))

    def loss_fn(ps):
        # data mismatch on the outer boundary (sub1 net; reference w=20)
        mse_u = 20.0 * jnp.mean((net_apply(ps[0], nets[0], data["boundary"]) - data["boundary_u"]) ** 2)
        # per-subdomain residuals (w=1)
        mse_f = sum(jnp.mean(residual(ps[k], nets[k], data["res"][k]) ** 2) for k in range(3))
        # interface continuity: sub1<->sub2 on iface1, sub1<->sub3 on iface2
        mse_avg = 0.0
        mse_r = 0.0
        for iface, k_nb in ((data["iface"][0], 1), (data["iface"][1], 2)):
            u1 = net_apply(ps[0], nets[0], iface)
            un = net_apply(ps[k_nb], nets[k_nb], iface)
            avg = (u1 + un) / 2.0
            mse_avg += 20.0 * jnp.mean((u1 - avg) ** 2) + 20.0 * jnp.mean((un - avg) ** 2)
            r1 = residual(ps[0], nets[0], iface)
            rn = residual(ps[k_nb], nets[k_nb], iface)
            mse_r += jnp.mean((r1 - rn) ** 2)
        return mse_u + mse_f + mse_avg + mse_r

    tx = optax.adam(cfg.TRAIN.learning_rate if cfg else 5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(ps, opt):
        loss, g = jax.value_and_grad(loss_fn)(ps)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(ps, upd), opt, loss

    def l2_rel(ps):
        preds, exacts = [], []
        for k in range(3):
            xy = np.asarray(data["res"][k])
            preds.append(np.asarray(net_apply(ps[k], nets[k], data["res"][k])))
            exacts.append(exact_u(xy[:, :1], xy[:, 1:]))
        p = np.concatenate(preds).ravel()
        e = np.concatenate(exacts).ravel()
        return float(np.linalg.norm(e - p) / np.linalg.norm(e))

    return nets, params, opt, step, l2_rel


def train(cfg):
    nets, params, opt, step, l2_rel = build(cfg, seed=cfg.seed)
    steps = cfg.TRAIN.epochs * cfg.TRAIN.iters_per_epoch
    for it in range(steps):
        params, opt, loss = step(params, opt)
        if (it + 1) % max(cfg.log_freq, 1) == 0 or it == steps - 1:
            print(f"[xpinn][{it + 1}/{steps}] loss={float(loss):.5f}")
    err = l2_rel(params)
    print(f"XPINN Poisson l2_error: {err:.4e}")
    # persist for eval mode
    if cfg.output_dir:
        from paddlescience_tpu.utils import save_load

        save_load.save_checkpoint(
            {"params": {f"net{k}": p for k, p in enumerate(params)}},
            cfg.output_dir, "latest")
    return err


def evaluate(cfg):
    from paddlescience_tpu.utils import save_load

    nets, params, opt, step, l2_rel = build(cfg, seed=cfg.seed)
    path = cfg.get_path("EVAL.pretrained_model_path")
    if path:
        restored = save_load.load_pretrain(path)
        params = [restored[f"net{k}"] for k in range(3)]
    err = l2_rel(params)
    print(f"XPINN Poisson l2_error: {err:.4e}")
    return err


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/xpinn.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(cfg, train=train, evaluate=evaluate)

    return _main()


if __name__ == "__main__":
    main_cli()
