"""Bayesian posterior sampling with Hamiltonian Monte Carlo (reference
``examples/probability/bayesian_inference.py`` style usage of
``ppsci/probability/hmc.py``).

Samples a 2-D correlated Gaussian posterior and checks the chain moments,
then infers the posterior over a PINN-style unknown parameter k in
u = sin(k x) from noisy observations.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def main(n_samples=2000):
    import jax.numpy as jnp

    # 1. correlated Gaussian: mean (1, -1), cov [[1, .5], [.5, 1]]
    prec = np.linalg.inv(np.array([[1.0, 0.5], [0.5, 1.0]]))
    mu = jnp.array([1.0, -1.0])
    P = jnp.asarray(prec, jnp.float32)

    def log_prob(q):
        d = q["theta"] - mu
        return -0.5 * d @ P @ d

    hmc = psci.probability.HamiltonianMonteCarlo(log_prob, path_len=1.0, step_size=0.1)
    chain = hmc.run_chain(n_samples, {"theta": jnp.zeros(2)})
    samples = np.asarray(chain["theta"])[n_samples // 4:]
    mean, cov = samples.mean(0), np.cov(samples.T)
    print(f"gaussian posterior: mean {mean.round(2)}, cov diag {np.diag(cov).round(2)}")
    assert np.allclose(mean, [1.0, -1.0], atol=0.15)

    # 2. parameter inference: k in u = sin(k x), observed with noise
    rng = np.random.default_rng(0)
    x_obs = jnp.asarray(np.linspace(0, 1, 32, dtype=np.float32))
    k_true = 3.0
    y_obs = jnp.asarray(np.sin(k_true * np.asarray(x_obs)) + 0.05 * rng.normal(size=32).astype(np.float32))

    def log_prob_k(q):
        pred = jnp.sin(q["k"] * x_obs)
        return -0.5 * jnp.sum((pred - y_obs) ** 2) / 0.05**2 - 0.5 * (q["k"] / 10.0) ** 2

    hmc2 = psci.probability.HamiltonianMonteCarlo(log_prob_k, path_len=0.5, step_size=0.005)
    chain2 = hmc2.run_chain(n_samples, {"k": jnp.asarray(1.5)})
    k_samples = np.asarray(chain2["k"])[n_samples // 4:]
    print(f"inferred k: {k_samples.mean():.3f} ± {k_samples.std():.3f} (true {k_true})")
    assert abs(k_samples.mean() - k_true) < 0.2
    return k_samples.mean()
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/hmc_bayes.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.n_samples))

    return _main()


if __name__ == "__main__":
    main_cli()
