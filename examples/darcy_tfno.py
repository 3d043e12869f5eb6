"""Darcy flow operator learning with TFNO — or UNO via ``arch=uno``
(reference ``examples/neuraloperator/train_tfno.py`` / ``train_uno.py``).

Learns a -> u for -div(a grad u) = 1 on (0,1)^2. The dataset is generated
by the built-in finite-difference Darcy solver (data/dataset/science_dataset)
— the reference downloads darcyflow_*.npz instead.

Training recipe matches the reference config
(``examples/neuraloperator/conf/tfno_darcyflow_pretrain.yaml``): H1 relative
Sobolev training loss (``metric.py:184-383``), positional-encoding grid
channels (in_channels=3, DATASET.positional_encoding), 16x16 modes, AdamW
lr 5e-3 / weight decay 1e-4, StepDecay(60 epochs, 0.5), 300 epochs over a
1000-sample train set at resolution 16; eval metric is the reference's
per-sample relative L2 averaged over the test set (``metric.py:159-166``,
published 16_l2 = 0.08514, docs/zh/examples/neuraloperator.md:85-87).
"""

import math
import sys

import numpy as np

import paddlescience_tpu as psci


def _central_diff_2d(x, h):
    """Circular central differences on the last two axes (reference
    neuraloperator/metric.py:19-37, fix_bnd=False)."""
    import jax.numpy as jnp

    dx = (jnp.roll(x, -1, axis=-2) - jnp.roll(x, 1, axis=-2)) / (2.0 * h[0])
    dy = (jnp.roll(x, -1, axis=-1) - jnp.roll(x, 1, axis=-1)) / (2.0 * h[1])
    return dx, dy


def h1_rel_loss(output_dict, label_dict, weight_dict=None):
    """Reference H1Loss_train.rel (metric.py:340-383): per-sample relative
    H1 norm (function + first derivatives, spectral-uniform h = 2*pi/n),
    summed over the batch."""
    import jax.numpy as jnp

    x = output_dict["output"]
    y = label_dict["output"]
    h = [2 * math.pi / x.shape[-2], 2 * math.pi / x.shape[-1]]
    x_x, x_y = _central_diff_2d(x, h)
    y_x, y_y = _central_diff_2d(y, h)

    def flat(v):
        return v.reshape(v.shape[0], -1)

    diff = jnp.linalg.norm(flat(x) - flat(y), axis=-1) ** 2
    ynorm = jnp.linalg.norm(flat(y), axis=-1) ** 2
    for xd, yd in ((x_x, y_x), (x_y, y_y)):
        diff += jnp.linalg.norm(flat(xd) - flat(yd), axis=-1) ** 2
        ynorm += jnp.linalg.norm(flat(yd), axis=-1) ** 2
    rel = jnp.sqrt(diff) / jnp.sqrt(ynorm)
    return {"output": jnp.sum(rel)}


def l2_rel_metric(output_dict, label_dict):
    """Reference LpLoss.__call__ eval metric: mean per-sample relative L2
    (metric.py:159-166 divides the batch-summed rel by batch size)."""
    import jax.numpy as jnp

    x = output_dict["output"].reshape(output_dict["output"].shape[0], -1)
    y = label_dict["output"].reshape(label_dict["output"].shape[0], -1)
    rel = jnp.linalg.norm(x - y, axis=-1) / jnp.linalg.norm(y, axis=-1)
    return {"l2": jnp.mean(rel)}


def _with_grid(a):
    """Append positional-encoding channels (reference
    data_utils.GridEmbedding2D semantics: x/y grids on [0,1], channel dim 1).
    a: (N, 1, R, R) -> (N, 3, R, R)."""
    n, _, rx, ry = a.shape
    gx, gy = np.meshgrid(np.linspace(0, 1, rx), np.linspace(0, 1, ry), indexing="ij")
    grid = np.stack([gx, gy]).astype(a.dtype)  # (2, R, R)
    grid = np.broadcast_to(grid[None], (n, 2, rx, ry))
    return np.concatenate([a, grid], axis=1)


def build_solver(epochs=300, n_train=1000, n_eval=100, resolution=16,
                 output_dir="./output_darcy_tfno", arch="tfno", batch_size=16):
    psci.utils.set_random_seed(42)
    from paddlescience_tpu.data.dataset.science_dataset import generate_darcy_dataset

    a, u = generate_darcy_dataset(n_train + n_eval, resolution, seed=0)
    # normalize the input field; the H1/L2-rel losses are per-sample
    # scale-invariant so u stays raw (reference encode_output=False)
    a = (a - a.mean()) / a.std()
    a = _with_grid(a)

    if arch == "uno":
        # reference train_uno.py MODEL config shape: contracting/expanding
        # spectral stages with per-stage modes and scalings
        model = psci.arch.UNONet(
            ("input",), ("output",),
            in_channels=3, out_channels=1, hidden_channels=32,
            lifting_channels=64, projection_channels=64, n_layers=4,
            uno_out_channels=(32, 64, 64, 32),
            uno_n_modes=((12, 12), (8, 8), (8, 8), (12, 12)),
            uno_scalings=((1.0, 1.0), (0.5, 0.5), (2.0, 2.0), (1.0, 1.0)),
        )
    else:
        # reference tfno_darcyflow_pretrain.yaml MODEL section
        model = psci.arch.TFNO2dNet(
            ("input",),
            ("output",),
            n_modes_height=16,
            n_modes_width=16,
            hidden_channels=32,
            in_channels=3,
            out_channels=1,
            lifting_channels=256,
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
            "batch_size": batch_size,
            "sampler": {"shuffle": True},
        },
        psci.loss.FunctionalLoss(h1_rel_loss),
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
                "batch_size": batch_size,
            },
            psci.loss.L2RelLoss(),
            {"output": lambda out: out["output"]},
            metric={"l2": psci.metric.FunctionalMetric(l2_rel_metric)},
            name="u_val",
        )
    }
    iters = max(n_train // batch_size, 1)
    lr = psci.optimizer.lr_scheduler.Step(
        epochs=epochs, iters_per_epoch=iters, learning_rate=5e-3,
        step_size=60, gamma=0.5, by_epoch=True,
    )()
    optimizer = psci.optimizer.AdamW(lr, weight_decay=1e-4)(model)
    return psci.solver.Solver(
        model,
        {"Sup": sup},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters,
        validator=validator,
        eval_during_train=True,
        eval_freq=10,
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
