"""IOPS: industrial air-pollution type classification (reference
``examples/iops/iops.py``): a small MLP classifies the pollution type from
five monitored features (PM2.5, PM10, SO2, NO2, CO) with class-weighted
cross-entropy and early stopping.

Data: Excel sheet (trainData.xlsx). A synthetic Gaussian-mixture dataset
with the same five features and class imbalance is generated when absent.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci

N_CLASSES = 4
FEATURES = ("PM2.5", "PM10", "SO2", "NO2", "CO")


def synth_pollution(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (N_CLASSES, len(FEATURES)))
    weights = np.array([0.45, 0.3, 0.15, 0.1])
    y = rng.choice(N_CLASSES, n, p=weights)
    X = centers[y] + 0.7 * rng.standard_normal((n, len(FEATURES)))
    return X.astype("float32"), y.astype("int64")


def load_data(path, seed=0):
    if path and osp.exists(path):
        import pandas as pd

        df = pd.read_excel(path)
        classes = sorted(df["pollution_type"].unique())
        y = df["pollution_type"].map({c: i for i, c in enumerate(classes)}).values
        X = df[list(FEATURES)].values.astype("float32")
        return X, y.astype("int64")
    print(f"[iops] {path!r} absent -> synthetic pollution-type dataset")
    return synth_pollution(seed=seed)


def _xent_loss(class_weights):
    import jax
    import jax.numpy as jnp

    w = jnp.asarray(class_weights)

    def loss(out, label, weight=None):
        logits = out["output"]
        y = label["label"].astype(jnp.int32).reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        return {"xent": jnp.mean(w[y] * nll)}

    return loss


def build_solver(epochs=100, output_dir="./outputs_iops", batch_size=32,
                 learning_rate=1e-3, data_path="./dataset/iops/trainData.xlsx"):
    psci.utils.set_random_seed(42)
    X, y = load_data(data_path)
    mean, std = X.mean(0), X.std(0) + 1e-9
    X = (X - mean) / std
    rng = np.random.default_rng(42)
    idx = rng.permutation(len(X))
    n_test = len(X) // 5
    test_idx, train_idx = idx[:n_test], idx[n_test:]
    X_tr, y_tr = X[train_idx], y[train_idx]
    X_te, y_te = X[test_idx], y[test_idx]
    counts = np.bincount(y_tr, minlength=N_CLASSES).astype("float32")
    class_weights = len(y_tr) / (N_CLASSES * np.maximum(counts, 1.0))

    model = psci.arch.MLP(("input",), ("output",), 3, 64, activation="relu",
                          input_dim=len(FEATURES), output_dim=N_CLASSES)

    iters = max(len(X_tr) // batch_size, 1)
    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {"input": X_tr}, "label": {"label": y_tr[:, None].astype("float32")}},
         "batch_size": batch_size, "iters_per_epoch": iters,
         "sampler": {"name": "BatchSampler", "drop_last": True, "shuffle": True}},
        psci.loss.FunctionalLoss(_xent_loss(class_weights)),
        {"output": lambda out: out["output"]},
        name="Sup",
    )

    def accuracy(out, label):
        import jax.numpy as jnp

        pred = jnp.argmax(out["output"], axis=-1)
        return {"acc": jnp.mean((pred == label["label"].reshape(-1).astype(jnp.int32)).astype(jnp.float32))}

    validator = {
        "iops_valid": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"input": X_te}, "label": {"label": y_te[:, None].astype("float32")}},
             "total_size": len(X_te), "batch_size": len(X_te),
             "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": False}},
            psci.loss.FunctionalLoss(_xent_loss(class_weights)),
            {"output": lambda out: out["output"]},
            metric={"Accuracy": psci.metric.FunctionalMetric(accuracy)},
            name="iops_valid",
        )
    }
    lr = psci.optimizer.lr_scheduler.Step(epochs, iters, learning_rate, step_size=50, gamma=0.5)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=iters,
        eval_during_train=False, validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/iops.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
