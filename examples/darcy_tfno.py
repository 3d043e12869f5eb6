"""Darcy flow operator learning with TFNO — or UNO via ``arch=uno``
(reference ``examples/neuraloperator/train_tfno.py`` / ``train_uno.py``).

Learns a -> u for -div(a grad u) = 1 on (0,1)^2. The dataset is generated
by the built-in finite-difference Darcy solver (data/dataset/science_dataset)
— the reference downloads darcyflow_*.npz instead.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def build_solver(epochs=50, n_train=128, n_eval=32, resolution=32,
                 output_dir="./output_darcy_tfno", arch="tfno"):
    psci.utils.set_random_seed(42)
    from paddlescience_tpu.data.dataset.science_dataset import generate_darcy_dataset

    a, u = generate_darcy_dataset(n_train + n_eval, resolution, seed=0)
    # normalize
    a_mean, a_std = a.mean(), a.std()
    u_scale = np.abs(u).max()
    a = (a - a_mean) / a_std
    u = u / u_scale

    if arch == "uno":
        # reference train_uno.py MODEL config shape: contracting/expanding
        # spectral stages with per-stage modes and scalings
        model = psci.arch.UNONet(
            ("input",), ("output",),
            in_channels=1, out_channels=1, hidden_channels=32,
            lifting_channels=64, projection_channels=64, n_layers=4,
            uno_out_channels=(32, 64, 64, 32),
            uno_n_modes=((12, 12), (8, 8), (8, 8), (12, 12)),
            uno_scalings=((1.0, 1.0), (0.5, 0.5), (2.0, 2.0), (1.0, 1.0)),
        )
    else:
        model = psci.arch.TFNO2dNet(
            ("input",),
            ("output",),
            n_modes_height=12,
            n_modes_width=12,
            hidden_channels=32,
            in_channels=1,
            out_channels=1,
            lifting_channels=64,
            projection_channels=64,
            n_layers=4,
        )
    sup = psci.constraint.SupervisedConstraint(
        {
            "dataset": {
                "name": "NamedArrayDataset",
                "input": {"input": a[:n_train]},
                "label": {"output": u[:n_train]},
            },
            "batch_size": 16,
            "sampler": {"shuffle": True},
        },
        psci.loss.L2RelLoss(),
        {"output": lambda out: out["output"]},
        name="Sup",
    )
    validator = {
        "u_val": psci.validate.SupervisedValidator(
            {
                "dataset": {
                    "name": "NamedArrayDataset",
                    "input": {"input": a[n_train:]},
                    "label": {"output": u[n_train:]},
                },
                "batch_size": 16,
            },
            psci.loss.L2RelLoss(),
            {"output": lambda out: out["output"]},
            metric={"L2Rel": psci.metric.L2Rel()},
            name="u_val",
        )
    }
    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=n_train // 16, learning_rate=1e-3
    )()
    optimizer = psci.optimizer.AdamW(lr, weight_decay=1e-4)(model)
    return psci.solver.Solver(
        model,
        {"Sup": sup},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=n_train // 16,
        validator=validator,
        log_freq=50,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/darcy_tfno.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
