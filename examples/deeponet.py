"""DeepONet antiderivative operator (reference ``examples/deeponet/deeponet.py``).

G(u)(y) = int_0^y u(s) ds. The reference downloads antiderivative_*.dat;
here training/eval data are generated from a Gaussian-random-field-like
function family (sum of random-amplitude cosines) — same task, no download.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def make_data(n_samples: int, m: int = 100, seed: int = 0):
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 1, m, dtype=np.float32)
    k = np.arange(8)[None, :]
    amp = rng.normal(size=(n_samples, 8)).astype(np.float32) / (1 + k)
    phase = rng.uniform(0, 2 * np.pi, size=(n_samples, 8)).astype(np.float32)
    # u(x) = sum_k a_k cos(k pi x + phi_k)
    u = np.einsum("sk,skm->sm", amp, np.cos(np.pi * k[..., None] * xs[None, None, :] + phase[..., None])).astype(
        np.float32
    )
    y = rng.uniform(0, 1, size=(n_samples, 1)).astype(np.float32)
    # exact antiderivative: sum_k a_k [sin(k pi y + phi) - sin(phi)]/(k pi), k=0 term: a_0 cos(phi) y
    G = np.zeros((n_samples, 1), np.float32)
    for kk in range(8):
        if kk == 0:
            G[:, 0] += amp[:, 0] * np.cos(phase[:, 0]) * y[:, 0]
        else:
            G[:, 0] += (
                amp[:, kk] * (np.sin(kk * np.pi * y[:, 0] + phase[:, kk]) - np.sin(phase[:, kk])) / (kk * np.pi)
            )
    return {"u": u, "y": y}, {"G": G}


def build_solver(epochs=100, iters_per_epoch=32, output_dir="./output_deeponet",
                 n_train=10000, batch_size=312, n_eval=2000, seed=42):
    psci.utils.set_random_seed(seed)
    # reference conf: m=100 sensors, 40 features, 1 hidden layer of 40 each
    model = psci.arch.DeepONet("u", "y", "G", 100, 40, 1, 1, 40, 40, branch_activation="relu", trunk_activation="relu")

    train_in, train_lab = make_data(n_train, seed=seed)
    sup = psci.constraint.SupervisedConstraint(
        {
            "dataset": {"name": "NamedArrayDataset", "input": train_in, "label": train_lab},
            "batch_size": min(batch_size, n_train),
            "sampler": {"shuffle": True},
        },
        psci.loss.MSELoss(),
        {"G": lambda out: out["G"]},
        name="Sup",
    )

    eval_in, eval_lab = make_data(n_eval, seed=7)
    validator = {
        "G_validator": psci.validate.SupervisedValidator(
            {
                "dataset": {"name": "NamedArrayDataset", "input": eval_in, "label": eval_lab},
                "batch_size": 500,
            },
            psci.loss.MSELoss(),
            {"G": lambda out: out["G"]},
            metric={"L2Rel": psci.metric.L2Rel()},
            name="G_validator",
        )
    }

    optimizer = psci.optimizer.Adam(1e-3)(model)
    return psci.solver.Solver(
        model,
        {"Sup": sup},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        validator=validator,
        log_freq=200,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/deeponet.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
