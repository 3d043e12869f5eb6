"""CFD-GCN: coarse-CFD-informed graph network (reference
``examples/cfdgcn/cfdgcn.py``).

A MeshGraphNet processor whose node features are augmented with a coarse
CFD solution before message passing (``psci.arch.CFDGCN``). The reference
couples SU2 into the training loop; SU2 is unavailable here, so the coarse
solver is a differentiable potential-flow surrogate (uniform flow + doublet
around the cylinder) — the documented no-SU2 path of the arch. Data: airfoil
mesh graphs from MeshAirfoilDataset (real su2 mesh files when ``data_dir``
is set, synthetic kNN meshes otherwise).
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci


def potential_flow_surrogate(node_feats):
    """Coarse field: uniform flow + doublet from the first two feature
    columns (x, y) — the SU2 stand-in (differentiable, device-side)."""
    import jax.numpy as jnp

    x, y = node_feats[:, 0:1], node_feats[:, 1:2]
    r2 = x**2 + y**2 + 1e-3
    u = 1.0 - (x**2 - y**2) / r2**2
    v = -2 * x * y / r2**2
    p = 1.0 - (u**2 + v**2) / 2
    return jnp.concatenate([u, v, p], axis=-1)


def run(steps=60, hidden=64, n_layers=4, lr=1e-3, num_samples=8, data_dir=None):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds = psci.data.build_dataset({"name": "MeshAirfoilDataset",
        "input_keys": ("input",), "label_keys": ("label",),
        "data_dir": data_dir, "num_samples": num_samples})
    node_dim = ds[0][0]["input"][0].shape[-1]
    edge_dim = ds[0][0]["input"][1].shape[-1]
    out_dim = ds[0][1]["label"].shape[-1]
    model = psci.arch.CFDGCN(("input",), ("pred",),
                             node_in_dim=node_dim + 3, edge_in_dim=edge_dim,
                             out_dim=out_dim, hidden=hidden, n_layers=n_layers,
                             cfd_solver=potential_flow_surrogate)
    params = model.param_tree()
    tx = optax.adam(lr)
    opt = tx.init(params)
    graphs = [ds[i][0]["input"] for i in range(len(ds))]
    labels = [jnp.asarray(ds[i][1]["label"]) for i in range(len(ds))]

    @jax.jit
    def step(params, opt, nf, ef, s, r, y):
        def loss_fn(p):
            pred = model.apply(p, {"input": (nf, ef, s, r)})["pred"]
            return jnp.mean((pred - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        i = it % len(graphs)
        nf, ef, s, r = (jnp.asarray(a) for a in graphs[i])
        params, opt, loss = step(params, opt, nf, ef, s, r, labels[i])
        first = float(loss) if it == 0 else first
        last = float(loss)
    print(f"CFDGCN: loss {first:.4f} -> {last:.4f} over {steps} steps")
    assert last < first
    return last


def main_cli():
    @psci.utils.config.main("conf/cfdgcn.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg,
            train=lambda c: run(steps=c.TRAIN.steps, hidden=c.hidden,
                                n_layers=c.n_layers, lr=c.TRAIN.learning_rate,
                                data_dir=c.get_path("data_dir")),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
