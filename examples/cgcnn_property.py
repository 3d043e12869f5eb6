"""CGCNN crystal property prediction (reference ``examples/cgcnn/cgcnn.py``).

Crystal graph convolutions over (atom features, gaussian-expanded bond
distances, neighbor indices) pooled per crystal to a scalar property. CIF
archives (pymatgen) are not downloadable; CGCNNDataset synthesizes periodic
structures whose target is a deterministic function of the features.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def main(steps=80):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds = psci.data.build_dataset({"name": "CGCNNDataset", "num_samples": 16,
                                  "n_atoms": 12, "atom_fea_len": 16, "nbr_fea_len": 8})
    model = psci.arch.CrystalGraphConvNet(
        orig_atom_fea_len=16, nbr_fea_len=8, atom_fea_len=32, n_conv=2, h_fea_len=32)
    params = model.param_tree()
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    # batch all crystals into one graph (block-diagonal) — static shapes for jit
    feats, nbrs, idxs, targets, atom_idx = [], [], [], [], []
    off = 0
    for i in range(len(ds)):
        (a, n, idx), y = ds.items[i]
        feats.append(a)
        nbrs.append(n)
        idxs.append(idx + off)
        atom_idx.append(np.arange(off, off + len(a)))
        targets.append(y)
        off += len(a)
    atom_fea = jnp.asarray(np.concatenate(feats))
    nbr_fea = jnp.asarray(np.concatenate(nbrs))
    nbr_idx = jnp.asarray(np.concatenate(idxs))
    y = jnp.asarray(np.asarray(targets))[:, None]
    crystal_atom_idx = [jnp.asarray(ix) for ix in atom_idx]

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, {"i": (atom_fea, nbr_fea, nbr_idx, crystal_atom_idx)})
            return jnp.mean((out["out"] - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        params, opt, loss = step(params, opt)
        if it == 0:
            first = float(loss)
        last = float(loss)
    print(f"CGCNN property MSE: {first:.4f} -> {last:.4f} over {steps} steps")
    assert last < first
    return last
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/cgcnn_property.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps))

    return _main()


if __name__ == "__main__":
    main_cli()
