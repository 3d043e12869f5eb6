"""AMGNet flow-field prediction on airfoil (or cylinder, ``case=cylinder``)
meshes (reference ``examples/amgnet/amgnet_airfoil.py`` /
``amgnet_cylinder.py``).

Graph-to-field regression with the MeshGraphNet-style processor (the
reference's pyamg multigrid coarsening is documented as unavailable — the
flat full-resolution processor keeps the same I/O contract). Mesh pickles
are not downloadable, so MeshAirfoilDataset falls back to synthetic kNN
planar graphs; training runs one graph per step (variable node counts =
one jit trace per graph size, so the synthetic graphs share one size).
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def main(steps=40, case="airfoil"):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds_name = "MeshCylinderDataset" if case == "cylinder" else "MeshAirfoilDataset"
    node_dim = 4 if case == "cylinder" else 5
    ds = psci.data.build_dataset({"name": ds_name,
        "input_keys": ("input",), "label_keys": ("label",), "num_samples": 8})
    model = psci.arch.AMGNet(("input",), ("pred",), node_in_dim=node_dim,
                             edge_in_dim=3, out_dim=3, hidden=64, n_layers=4)
    params = model.param_tree()
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    graphs = [ds[i][0]["input"] for i in range(len(ds))]
    labels = [jnp.asarray(ds[i][1]["label"]) for i in range(len(ds))]
    # AMG-style greedy aggregation per graph (static; reference uses pyamg)
    coarse = [psci.arch.AMGNet.coarsen(g[2], g[3], len(g[0])) for g in graphs]

    import functools

    @functools.partial(jax.jit, static_argnums=(4,))
    def step(params, opt, nf, ef, gi, y):
        assign, cs, cr = coarse[gi]
        s, r = (jnp.asarray(graphs[gi][2]), jnp.asarray(graphs[gi][3]))
        def loss_fn(p):
            out = model.apply(p, {"input": (nf, ef, s, r, assign,
                                            jnp.asarray(cs), jnp.asarray(cr))})
            pred = out["pred"]
            return jnp.mean((pred - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        i = it % len(graphs)
        nf, ef = jnp.asarray(graphs[i][0]), jnp.asarray(graphs[i][1])
        params, opt, loss = step(params, opt, nf, ef, i, labels[i])
        if it == 0:
            first = float(loss)
        last = float(loss)
    print(f"AMGNet {case}: loss {first:.4f} -> {last:.4f} over {steps} steps")
    assert last < first
    return last
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/amgnet_airfoil.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps, case=c.TRAIN.get("case", "airfoil")))

    return _main()


if __name__ == "__main__":
    main_cli()
