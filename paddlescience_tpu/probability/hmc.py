"""Hamiltonian Monte Carlo (reference ``ppsci/probability/hmc.py:44-170``).

TPU-native: the leapfrog integrator and MH acceptance run inside one
``lax.scan`` over samples — the whole chain is a single XLA program, vs. the
reference's Python loop of paddle ops per sample.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["HamiltonianMonteCarlo"]


class HamiltonianMonteCarlo:
    """HMC sampler over a pytree of latent variables.

    Args:
        distribution_fn: log-prob function of the latent pytree (unnormalized).
        path_len: leapfrog trajectory length.
        step_size: leapfrog step size.
    """

    def __init__(self, distribution_fn: Callable, path_len: float = 1.0, step_size: float = 0.25):
        self.log_prob = distribution_fn
        self.steps = max(int(path_len / step_size), 1)
        self.step_size = step_size

    def init_state(self, initial_position):
        return jax.tree.map(jnp.asarray, initial_position)

    def run_chain(self, epochs: int, initial_position, seed: int = 0):
        """Sample `epochs` draws; returns a pytree of stacked samples."""
        position = self.init_state(initial_position)
        grad_fn = jax.grad(self.log_prob)
        step_size, steps = self.step_size, self.steps

        def leapfrog(q, p):
            g = grad_fn(q)

            def body(_, carry):
                q, p, g = carry
                p = jax.tree.map(lambda p_, g_: p_ + 0.5 * step_size * g_, p, g)
                q = jax.tree.map(lambda q_, p_: q_ + step_size * p_, q, p)
                g = grad_fn(q)
                p = jax.tree.map(lambda p_, g_: p_ + 0.5 * step_size * g_, p, g)
                return q, p, g

            q, p, g = jax.lax.fori_loop(0, steps, body, (q, p, g))
            return q, p

        def one_sample(q, key):
            k1, k2 = jax.random.split(key)
            leaves, treedef = jax.tree.flatten(q)
            keys = jax.random.split(k1, len(leaves))
            p = treedef.unflatten(
                [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
            )
            q_new, p_new = leapfrog(q, p)

            def kinetic(p_):
                return 0.5 * sum(jnp.sum(x**2) for x in jax.tree.leaves(p_))

            h_old = -self.log_prob(q) + kinetic(p)
            h_new = -self.log_prob(q_new) + kinetic(p_new)
            accept = jax.random.uniform(k2) < jnp.exp(h_old - h_new)
            q = jax.tree.map(lambda a, b: jnp.where(accept, a, b), q_new, q)
            return q, q

        keys = jax.random.split(jax.random.PRNGKey(seed), epochs)
        _, samples = jax.lax.scan(one_sample, position, keys)
        return samples
