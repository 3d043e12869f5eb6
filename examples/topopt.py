"""TopOpt: neural topology optimization (reference
``examples/topopt/topopt.py`` + ``topoptmodel.py``; Sosnovik & Oseledets
2019, arXiv:1709.09578).

A UNetEx maps an intermediate SIMP density snapshot (2 channels: X_k and the
5-step increment X_k - X_{k-5}) to the final optimized binary topology.
Loss = binary cross-entropy + vol_coeff * (mean density mismatch)^2
(reference ``topopt.py:265-276``); metrics Binary_Acc + IoU
(``topopt.py:279-319``); D4 symmetry augmentation (``functions.py:102-134``).

The reference's 10k-sample SIMP HDF5 archive is not downloadable; when
``DATA_PATH`` is null a synthetic generator produces SIMP-like sequences
(gaussian random fields progressively binarized with rising sharpness, the
same statistical structure the CNN learns from). Pass DATA_PATH=<h5> with
datasets "iters" (N,100,H,W) and "targets" (N,H,W) to train on real data.
The channel sampler k ~ Poisson(lam)|Uniform follows ``functions.py:23-66``.
"""

from __future__ import annotations

import numpy as np


def synthesize_simp(n_samples=64, H=40, W=40, n_iters=24, seed=0):
    """SIMP-like sequences: smooth random field -> progressive binarization."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    iters = np.zeros((n_samples, n_iters, H, W), np.float32)
    targets = np.zeros((n_samples, H, W), np.float32)
    for i in range(n_samples):
        field = np.zeros((H, W), np.float32)
        for _ in range(rng.integers(3, 7)):
            cy, cx = rng.uniform(0, H), rng.uniform(0, W)
            sig = rng.uniform(H / 8, H / 3)
            field += rng.uniform(0.5, 1.5) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
        thresh = np.quantile(field, 1.0 - rng.uniform(0.3, 0.5))  # vol fraction
        targets[i] = (field > thresh).astype(np.float32)
        for k in range(n_iters):
            sharp = 0.5 + 8.0 * (k / (n_iters - 1)) ** 2
            x = 1.0 / (1.0 + np.exp(-sharp * (field - thresh) * 8.0))
            x += 0.05 * (1 - k / n_iters) * rng.standard_normal((H, W))
            iters[i, k] = np.clip(x, 0.0, 1.0)
    return iters, targets


def make_sampler(kind: str, num: int, n_iters: int):
    rng = np.random.default_rng(1)
    hi = n_iters - 1
    if kind == "Fixed":
        return lambda: min(max(num, 1), hi)
    if kind == "Poisson":
        return lambda: min(max(int(rng.poisson(num)), 1), hi)
    return lambda: int(rng.integers(1, hi + 1))  # Uniform


def channel_sample(iters, sampler):
    """(N, T, H, W) -> (N, 2, H, W): snapshot at k and 5-step increment."""
    n = len(iters)
    x = np.zeros((n, 2, *iters.shape[2:]), np.float32)
    for i in range(n):
        k = sampler()
        x[i, 0] = iters[i, k]
        x[i, 1] = iters[i, k] - iters[i, max(k - 5, 0)]
    return x


def augmentation(inp, lab, wgt):
    """Random D4 transformation (reference functions.py:102-134)."""
    x, y = inp["input"], lab["output"]
    if np.random.random() > 0.5:
        x, y = np.flip(x, -1), np.flip(y, -1)
    if np.random.random() > 0.5:
        x, y = np.flip(x, -2), np.flip(y, -2)
    if np.random.random() > 0.5:
        x, y = np.rot90(x, axes=(-2, -1)), np.rot90(y, axes=(-2, -1))
    return {"input": np.ascontiguousarray(x)}, {"output": np.ascontiguousarray(y)}, wgt


def build_solver(epochs=8, batch_size=16, n_samples=64, vol_coeff=1.0,
                 learning_rate=1e-3, sampler=("Uniform", 0), data_path=None,
                 output_dir="./output_topopt", seed=42):
    import jax.numpy as jnp

    import paddlescience_tpu as psci

    psci.utils.set_random_seed(seed)
    if data_path:
        import h5py

        with h5py.File(data_path, "r") as f:
            iters = np.asarray(f["iters"], np.float32)[:n_samples]
            targets = np.asarray(f["targets"], np.float32)[:n_samples]
    else:
        iters, targets = synthesize_simp(n_samples=n_samples, seed=seed)

    k_sampler = make_sampler(sampler[0], sampler[1], iters.shape[1])
    x = channel_sample(iters, k_sampler)
    y = targets[:, None]  # (N, 1, H, W)
    n_train = int(0.8 * len(x))

    model = psci.arch.UNetEx("input", "output", in_channel=2, out_channel=1,
                             kernel_size=3, filters=(16, 32, 64), layers=2,
                             weight_norm=False, batch_norm=False,
                             final_activation="sigmoid")

    def conf_loss(out, lab, wgt=None):
        p = jnp.clip(out["output"], 1e-7, 1 - 1e-7)
        t = lab["output"]
        bce = -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
        vol = jnp.square(jnp.mean(t - p))
        return {"output": bce + vol_coeff * vol}

    def val_metric(out, lab):
        pred = jnp.round(out["output"])
        true = jnp.round(lab["output"])
        acc = jnp.mean((pred == true).astype(jnp.float32))
        tp = jnp.sum((pred == 1) & (true == 1))
        tn = jnp.sum((pred == 0) & (true == 0))
        fp = jnp.sum((pred == 0) & (true == 1))
        fn = jnp.sum((pred == 1) & (true == 0))
        iou = 0.5 * (tn / (tn + fn + fp + 1e-9) + tp / (tp + fp + fn + 1e-9))
        return {"Binary_Acc": acc, "IoU": iou}

    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {"input": x[:n_train]},
                     "label": {"output": y[:n_train]},
                     "transforms": augmentation},
         "batch_size": batch_size,
         "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": False}},
        psci.loss.FunctionalLoss(conf_loss),
        {"output": lambda out: out["output"]},
        name="sup_constraint")
    validator = {
        "topopt_val": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"input": x[n_train:]},
                         "label": {"output": y[n_train:]}},
             "batch_size": batch_size},
            psci.loss.FunctionalLoss(conf_loss),
            {"output": lambda out: out["output"]},
            metric={"metrics": psci.metric.FunctionalMetric(val_metric)},
            name="topopt_val")}

    iters_per_epoch = max(n_train // batch_size, 1)
    lr = learning_rate / (1 + epochs // 15)
    return psci.solver.Solver(
        model, {"sup_constraint": sup}, output_dir,
        psci.optimizer.Adam(lr, epsilon=1e-7)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator=validator, eval_during_train=False, seed=seed,
        log_freq=max(iters_per_epoch, 1))


def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/topopt.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
