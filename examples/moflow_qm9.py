"""MoFlow molecular generation (reference ``examples/moflow/moflow_train.py``).

Trains the invertible coupling flow over (atom one-hot, bond adjacency)
tensors by maximizing likelihood (z ~ N(0,I) + log-det), then inverts the
flow to generate molecules. QM9 csv is not downloadable; MOlFLOWDataset
synthesizes random chain molecules with the same tensor layout.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def main(steps=80):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds = psci.data.build_dataset({"name": "MOlFLOWDataset", "num_samples": 64,
                                  "max_atoms": 9, "n_types": 5})
    nodes = jnp.asarray(ds.input["nodes"])
    edges = jnp.asarray(ds.input["edges"])

    model = psci.arch.MoFlowNet(b_n_type=4, a_n_node=9, a_n_type=5,
                                b_hidden=64, a_hidden=64, b_n_blocks=2, a_n_blocks=2)
    params = model.param_tree()
    tx = optax.adam(5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def nll(p):
            out = model.apply(p, {"nodes": nodes, "edges": edges})
            z, logdet = out["output"], out["sum_log_det"]
            # negative log-likelihood under standard normal prior
            return jnp.mean(0.5 * jnp.sum(z**2, axis=-1) - logdet)
        loss, g = jax.value_and_grad(nll)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        params, opt, loss = step(params, opt)
        if it == 0:
            first = float(loss)
        last = float(loss)
    print(f"MoFlow NLL: {first:.3f} -> {last:.3f} over {steps} steps")
    assert last < first

    # generation: sample latents, invert the flow
    model.load_param_tree(params)
    key = jax.random.PRNGKey(0)
    z_dim = 9 * 5 + 9 * 4 * 9
    z = 0.5 * jax.random.normal(key, (4, z_dim))
    gen_nodes, gen_edges = model.reverse(z)
    print("generated molecules:", gen_nodes.shape, gen_edges.shape)
    # invertibility check on real data
    out = model.apply(params, {"nodes": nodes[:2], "edges": edges[:2]})
    rec_nodes, rec_edges = model.reverse(out["output"])
    err = float(jnp.abs(rec_nodes - nodes[:2]).max())
    print(f"roundtrip max err: {err:.2e}")
    assert err < 1e-4
    return last
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/moflow_qm9.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps))

    return _main()


if __name__ == "__main__":
    main_cli()
