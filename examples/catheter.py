"""Catheter bacteria-transport operator (reference
``examples/catheter/catheter.py``): FNO1d maps catheter channel geometry
(x, y) wall profiles to the (log) steady bacteria distribution.

Data: four .npy arrays (x/y/para/output). When absent, synthetic sawtooth
channel geometries with an exponential-decay contamination profile of the
wall parameters are generated (documented fallback; the operator-learning
pipeline — L2Rel loss on log-field, exp at inference — is the reference's).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci

S = 2001  # sampled points per channel


def synth_data(n, seed=0):
    rng = np.random.default_rng(seed)
    xx = np.linspace(-500, 0, S, dtype="float32")
    inputs, labels = [], []
    for _ in range(n):
        amp = rng.uniform(5, 40)
        period = rng.uniform(30, 150)
        base = rng.uniform(10, 30)
        y = base + amp * np.abs(((xx / period) % 1.0) - 0.5) * 2  # sawtooth wall
        # contamination decays with distance modulated by wall height
        lam = 0.002 + 0.00005 * amp
        dist = np.exp(lam * xx) * (1 + 0.3 * np.sin(2 * np.pi * xx / period))
        dist = np.clip(dist, 1e-6, None)
        inputs.append(np.stack([xx, y.astype("float32")], -1))
        labels.append(np.log(dist).astype("float32")[:, None])
    return np.stack(inputs), np.stack(labels)


def load_data(data_dir, n, seed=0):
    names = ("x_1d_structured_mesh.npy", "y_1d_structured_mesh.npy",
             "data_info.npy", "density_1d_data.npy")
    paths = [osp.join(data_dir or ".", f) for f in names]
    if data_dir and all(osp.exists(p) for p in paths):
        X, Y, para, out = (np.load(p) for p in paths)
        inputX, inputY = X[:, 0::3].T, Y[:, 0::3].T
        label = ((out[:, 0::3] + out[:, 1::3] + out[:, 2::3]) / 3.0).T
        inp = np.stack([inputX, inputY], -1).astype("float32")[:n].reshape(n, S, 2)
        return inp, np.log(np.clip(label[:n], 1e-6, None)).astype("float32")[..., None]
    print(f"[catheter] data under {data_dir!r} absent -> synthetic channels")
    return synth_data(n, seed)


def build_solver(epochs=300, output_dir="./outputs_catheter", n_train=64, n_test=16,
                 batch_size=16, learning_rate=1e-3, modes=32, width=32,
                 data_dir="./dataset/catheter"):
    psci.utils.set_random_seed(42)
    x_train, y_train = load_data(data_dir, n_train, seed=0)
    x_test, y_test = load_data(None, n_test, seed=1)

    model = psci.arch.FNO1d(("input",), ("output",), modes=modes, width=width,
                            padding=100, input_channel=2, output_np=S)
    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {"input": x_train}, "label": {"output": y_train}},
         "batch_size": batch_size, "iters_per_epoch": max(n_train // batch_size, 1),
         "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": True}},
        psci.loss.L2RelLoss(reduction="sum"),
        name="sup_constraint",
    )
    validator = {
        "catheter_valid": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"input": x_test}, "label": {"output": y_test}},
             "total_size": n_test, "batch_size": n_test,
             "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": False}},
            psci.loss.L2RelLoss(reduction="sum"),
            metric={"L2Rel": psci.metric.L2Rel()},
            name="catheter_valid",
        )
    }
    lr = psci.optimizer.lr_scheduler.Step(
        epochs, max(n_train // batch_size, 1), learning_rate,
        step_size=max(epochs // 4, 1), gamma=0.5)()
    return psci.solver.Solver(
        model, {"sup_constraint": sup}, output_dir,
        psci.optimizer.Adam(lr, weight_decay=1e-4)(model),
        epochs=epochs, iters_per_epoch=max(n_train // batch_size, 1),
        eval_during_train=False, validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/catheter.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
