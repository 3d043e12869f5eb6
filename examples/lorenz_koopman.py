"""Lorenz system Koopman embedding + transformer surrogate
(reference ``examples/lorenz/train_enn.py`` + ``train_transformer.py``).

Stage 1 trains LorenzEmbedding (encode-advance-decode with a learned Koopman
matrix) on generated Lorenz trajectories (the reference downloads
lorenz_training_rk.hdf5 — here an RK4 integrator generates the data).
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def make_lorenz_data(n_traj=64, T=256, dt=0.01, seed=0):
    rng = np.random.default_rng(seed)

    def rhs(s):
        x, y, z = s[..., 0], s[..., 1], s[..., 2]
        return np.stack([10.0 * (y - x), x * (28.0 - z) - y, x * y - (8.0 / 3.0) * z], axis=-1)

    s = rng.uniform(-15, 15, size=(n_traj, 3))
    s[:, 2] += 25
    out = []
    for _ in range(T):
        k1 = rhs(s)
        k2 = rhs(s + dt / 2 * k1)
        k3 = rhs(s + dt / 2 * k2)
        k4 = rhs(s + dt * k3)
        s = s + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        out.append(s.copy())
    data = np.stack(out, axis=1).astype(np.float32)  # (n_traj, T, 3)
    return data


def build_solver(epochs=50, iters_per_epoch=8, seq_len=16, output_dir="./output_lorenz_enn"):
    psci.utils.set_random_seed(42)
    data = make_lorenz_data()
    mean, std = data.mean((0, 1)), data.std((0, 1))
    # windows of seq_len
    windows = np.concatenate(
        [data[:, i : i + seq_len] for i in range(0, data.shape[1] - seq_len, seq_len)], axis=0
    )

    model = psci.arch.LorenzEmbedding(
        ("states",),
        ("pred_states", "recover_states", "k_matrix"),
        mean=tuple(mean.tolist()),
        std=tuple(std.tolist()),
        input_size=3,
        hidden_size=128,
        embed_size=32,
    )

    def koopman_loss(output_dict, label_dict, weight_dict=None):
        pred = output_dict["pred_states"]
        recover = output_dict["recover_states"]
        states = label_dict["states"]
        k = output_dict["k_matrix"]
        import jax.numpy as jnp

        loss_rec = jnp.mean((recover - states) ** 2)
        loss_pred = jnp.mean((pred - states[:, 1:]) ** 2)
        loss_k = 0.01 * jnp.mean(k**2)
        return {"koopman": 10.0 * loss_rec + loss_pred + loss_k}

    sup = psci.constraint.SupervisedConstraint(
        {
            "dataset": {
                "name": "NamedArrayDataset",
                "input": {"states": windows},
                "label": {"states": windows},
            },
            "batch_size": 256,
            "sampler": {"shuffle": True},
        },
        psci.loss.FunctionalLoss(koopman_loss),
        {k: (lambda out, kk=k: out[kk]) for k in model.output_keys},
        name="Sup",
    )

    # held-out validator: one-step Koopman prediction MSE on windows from
    # trajectories the training split never saw (reference trains/evals
    # LorenzEmbedding with MSELoss over the rollout,
    # examples/transformer_physx train_enn.py)
    n_val = max(len(windows) // 8, 1)
    val_windows, windows = windows[-n_val:], windows[:-n_val]

    def pred_mse(output_dict, label_dict):
        import jax.numpy as jnp

        err = output_dict["pred_states"] - label_dict["states"][:, 1:]
        return {"pred_MSE": jnp.mean(err**2)}

    validator = {
        "koopman_val": psci.validate.SupervisedValidator(
            {
                "dataset": {
                    "name": "NamedArrayDataset",
                    "input": {"states": val_windows},
                    "label": {"states": val_windows},
                },
                "batch_size": 256,
            },
            psci.loss.FunctionalLoss(koopman_loss),
            {k: (lambda out, kk=k: out[kk]) for k in model.output_keys},
            metric={"pred_MSE": psci.metric.FunctionalMetric(pred_mse)},
            name="koopman_val",
        )
    }

    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3, gamma=0.995, decay_steps=iters_per_epoch
    )()
    return psci.solver.Solver(
        model,
        {"Sup": sup},
        output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        validator=validator,
        log_freq=100,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/lorenz_koopman.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
