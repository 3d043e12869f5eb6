"""GraphCast weather GNN (reference ``examples/graphcast/graphcast.py``).

Encode-process-decode over a lat-lon grid + icosahedral multi-mesh
(``psci.arch.GraphCastNet``: grid2mesh encoder, multi-mesh processor over the
union of all refinement levels, mesh2grid decoder): node features =
atmospheric channels, labels = next-step channels. The reference example is
eval-only against pretrained ERA5 weights; here mode=train fits the
synthetic GridMeshAtmosphericDataset (real graph template files are used
when ``data_dir`` is set) and mode=eval reports the per-node RMSE — the
reference's metric.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci


def _fit(steps=60, lat=8, lon=16, hidden=64, n_layers=4, lr=1e-3, num_samples=6,
         data_dir=None):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds = psci.data.build_dataset({"name": "GridMeshAtmosphericDataset",
        "input_keys": ("input",), "label_keys": ("label",),
        "data_dir": data_dir, "num_samples": num_samples, "lat": lat, "lon": lon})
    model = psci.arch.GraphCastNet(("grid",), ("pred",), node_in_dim=8,
                                   out_dim=8, hidden=hidden, n_layers=n_layers,
                                   lat=lat, lon=lon, mesh_level=2)
    params = model.param_tree()
    tx = optax.adam(lr)
    opt = tx.init(params)
    graphs = [ds[i][0]["input"] for i in range(len(ds))]
    labels = [jnp.asarray(ds[i][1]["label"]) for i in range(len(ds))]

    @jax.jit
    def step(params, opt, nf, y):
        def loss_fn(p):
            pred = model.apply(p, {"grid": nf})["pred"]
            return jnp.mean((pred - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        i = it % len(graphs)
        nf = jnp.asarray(graphs[i][0])  # grid node features
        params, opt, loss = step(params, opt, nf, labels[i])
        first = float(loss) if it == 0 else first
        last = float(loss)
    model.load_param_tree(params)
    # eval: per-node RMSE over the held-in set (reference graphcast.py metric)
    rmses = []
    for gr, y in zip(graphs, labels):
        pred = model.apply(params, {"grid": jnp.asarray(gr[0])})["pred"]
        rmses.append(float(jnp.sqrt(jnp.mean((pred - y) ** 2))))
    rmse = float(np.mean(rmses))
    print(f"GraphCast: loss {first:.4f} -> {last:.4f}; RMSE {rmse:.4f}")
    assert last < first
    return rmse


def main_cli():
    @psci.utils.config.main("conf/graphcast.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg,
            train=lambda c: _fit(steps=c.TRAIN.steps, lat=c.lat, lon=c.lon,
                                 hidden=c.hidden, n_layers=c.n_layers,
                                 lr=c.TRAIN.learning_rate,
                                 data_dir=c.get_path("data_dir")),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
