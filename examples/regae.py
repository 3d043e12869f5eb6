"""RegAE: variational autoencoder for pressure-field compression (reference
``examples/RegAE/RegAE.py``): AutoEncoder trained with decode-MSE + KL on
permeability/pressure snapshots, evaluated by reconstruction L2Rel.

Data: NPZ with key ``p_train`` (reference downloads of the Saratov dataset);
a smooth Gaussian-random-field snapshot set is synthesized when absent.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci


def synth_fields(n=256, dim=784, seed=0):
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(dim))
    k = np.fft.fftfreq(side)[:, None] ** 2 + np.fft.fftfreq(side)[None, :] ** 2
    amp = 1.0 / (1.0 + 400 * k)
    fields = []
    for _ in range(n):
        noise = rng.standard_normal((side, side))
        f = np.real(np.fft.ifft2(np.fft.fft2(noise) * amp))
        f = (f - f.mean()) / (f.std() + 1e-9)
        fields.append(f.reshape(-1))
    return np.stack(fields).astype("float32")


def load_p(path, n, seed):
    if path and osp.exists(path):
        return np.load(path)["p_train"].astype("float32")
    print(f"[regae] {path!r} absent -> synthetic GRF pressure snapshots")
    return synth_fields(n, seed=seed)


def _vae_loss(out, label, weight=None):
    import jax.numpy as jnp

    mu, log_sigma = out["mu"], out["log_sigma"]
    kl = 0.5 * jnp.sum(jnp.exp(2.0 * log_sigma) + mu**2 - 1.0 - 2.0 * log_sigma) / mu.shape[0]
    mse = jnp.mean((out["decoder_z"] - label["p_train"]) ** 2)
    return {"decode_loss": mse + kl}


def build_solver(epochs=200, output_dir="./outputs_regae", batch_size=64,
                 learning_rate=1e-3, latent_dim=50, hidden_dim=200,
                 train_file_path=None, valid_file_path=None):
    psci.utils.set_random_seed(42)
    p_train = load_p(train_file_path, 256, seed=0)
    p_valid = load_p(valid_file_path, 64, seed=1)
    dim = p_train.shape[1]

    model = psci.arch.AutoEncoder(
        ("p_train",), ("mu", "log_sigma", "decoder_z"),
        input_dim=dim, latent_dim=latent_dim, hidden_dim=hidden_dim)

    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {"p_train": p_train}, "label": {"p_train": p_train}},
         "batch_size": batch_size, "iters_per_epoch": max(len(p_train) // batch_size, 1),
         "sampler": {"name": "BatchSampler", "drop_last": True, "shuffle": False}},
        psci.loss.FunctionalLoss(_vae_loss),
        {"mu": lambda out: out["mu"], "log_sigma": lambda out: out["log_sigma"],
         "decoder_z": lambda out: out["decoder_z"]},
        name="Sup",
    )
    validator = {
        "regae_valid": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"p_train": p_valid}, "label": {"decoder_z": p_valid}},
             "total_size": len(p_valid), "batch_size": len(p_valid),
             "sampler": {"name": "BatchSampler", "drop_last": False, "shuffle": False}},
            psci.loss.MSELoss("mean"),
            {"decoder_z": lambda out: out["decoder_z"]},
            metric={"L2Rel": psci.metric.L2Rel()},
            name="regae_valid",
        )
    }
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(learning_rate)(model),
        epochs=epochs, iters_per_epoch=max(len(p_train) // batch_size, 1),
        eval_during_train=False, validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/regae.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
