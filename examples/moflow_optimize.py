"""MoFlow property optimization (reference
``examples/moflow/optimize_moflow.py``): fit a latent property regressor
over a trained flow, then gradient-ascend molecules in latent space.

Pipeline (reference ``optimize_moflow.py:100-198,423-540``): encode the
dataset through the (frozen) MoFlowNet, fit ``MoFlowProp``'s regressor head
on (latent, property) pairs, then for each seed molecule run gradient ascent
on the latent — in JAX the reference's manual ``backward()`` loop is just
``jax.grad`` of the property head, jitted once and scanned — and decode
each step. rdkit is unavailable in this environment, so qed/plogp are
replaced by a synthetic differentiably-learnable graph score (atom-type
balance + bond density); the optimization machinery is the reference's.
The constrained variant penalizes latent distance to the seed (the
reference's Tanimoto-similarity constraint, ``optimize_moflow.py:338``).
"""

import numpy as np

import paddlescience_tpu as psci


def graph_property(nodes, edges):
    """Synthetic stand-in for qed: rewards atom-type diversity and moderate
    bond density. Computed from soft (one-hot / decoded) tensors."""
    import jax.numpy as jnp

    type_frac = jnp.mean(nodes, axis=1)  # (B, a_dim)
    diversity = 1.0 - jnp.sum((type_frac - 1.0 / nodes.shape[-1]) ** 2, axis=-1)
    density = jnp.mean(edges[:, 1:], axis=(1, 2, 3))  # non-"no bond" channels
    return (diversity + 4.0 * density * (1.0 - density)).reshape(-1, 1)


def run(train_steps=60, fit_steps=200, opt_steps=40, opt_lr=0.5, sim_weight=0.0,
        n_opt=4):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds = psci.data.build_dataset({"name": "MOlFLOWDataset", "num_samples": 64,
                                  "max_atoms": 9, "n_types": 5})
    nodes = jnp.asarray(ds.input["nodes"])
    edges = jnp.asarray(ds.input["edges"])

    # ---- stage 1: likelihood-train the flow (reference assumes a trained
    # snapshot; moflow_qm9.py is the full recipe) ---------------------------
    flow = psci.arch.MoFlowNet(b_n_type=4, a_n_node=9, a_n_type=5,
                               b_hidden=64, a_hidden=64, b_n_blocks=2, a_n_blocks=2)
    params = flow.param_tree()
    tx = optax.adam(5e-4)
    opt = tx.init(params)

    @jax.jit
    def nll_step(params, opt):
        def nll(p):
            out = flow.apply(p, {"nodes": nodes, "edges": edges})
            return jnp.mean(0.5 * jnp.sum(out["output"] ** 2, axis=-1) - out["sum_log_det"])
        loss, g = jax.value_and_grad(nll)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(train_steps):
        params, opt, loss = nll_step(params, opt)
    flow.load_param_tree(params)
    print(f"flow NLL after {train_steps} steps: {float(loss):.3f}")

    # ---- stage 2: fit the property regressor on latents (fit_model) -------
    prop_model = psci.arch.MoFlowProp(flow, hidden_size=(64,))
    y = graph_property(nodes, edges)
    z_data = flow.apply(params, {"nodes": nodes, "edges": edges})["output"]
    prop_params = prop_model.param_tree()

    def head_of(hp, z):
        h = z
        for i, lin in enumerate(prop_model.hidden):
            h = jnp.tanh(lin.apply(hp["hidden"][str(i)], h))
        return prop_model.out.apply(hp["out"], h)

    # the flow stays frozen: optimize only the tiny head's own param tree
    head_params = {k: v for k, v in prop_params.items() if k != "model"}
    tx2 = optax.adam(1e-2)
    opt2 = tx2.init(head_params)

    @jax.jit
    def fit_step(hp, opt2):
        def mse(hp):
            pred = head_of(hp, z_data)
            return jnp.mean((pred - y) ** 2)
        loss, g = jax.value_and_grad(mse)(hp)
        upd, opt2 = tx2.update(g, opt2)
        return optax.apply_updates(hp, upd), opt2, loss

    for _ in range(fit_steps):
        head_params, opt2, fit_loss = fit_step(head_params, opt2)
    print(f"property head MSE after {fit_steps} steps: {float(fit_loss):.4f}")

    # ---- stage 3: latent gradient ascent (optimize_mol) --------------------
    seed_z = z_data[:n_opt]
    score_fn = lambda z: head_of(head_params, z).sum()

    @jax.jit
    def ascend(z0):
        def body(z, _):
            g = jax.grad(lambda zz: score_fn(zz)
                         - sim_weight * jnp.sum((zz - z0) ** 2))(z)
            return z + opt_lr * g, None
        z_T, _ = jax.lax.scan(body, z0, None, length=opt_steps)
        return z_T

    z_opt = ascend(seed_z)
    before = graph_property(*flow.reverse(seed_z))
    after = graph_property(*flow.reverse(z_opt))
    imp = float(jnp.mean(after - before))
    print(f"property before={float(jnp.mean(before)):.4f} "
          f"after={float(jnp.mean(after)):.4f} (mean improvement {imp:+.4f})")
    nodes_opt, edges_opt = flow.reverse(z_opt)
    print("optimized molecules:", nodes_opt.shape, edges_opt.shape)
    # gate metric is lower-is-better: return the negated improvement so a
    # regression (ascent stops improving) moves the metric UP past the pin
    return -imp


def main_cli():
    @psci.utils.config.main("conf/moflow_optimize.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg,
            train=lambda c: run(
                train_steps=c.TRAIN.train_steps, fit_steps=c.TRAIN.fit_steps,
                opt_steps=c.TRAIN.opt_steps, opt_lr=c.TRAIN.opt_lr,
                sim_weight=c.TRAIN.sim_weight))

    return _main()


if __name__ == "__main__":
    main_cli()
