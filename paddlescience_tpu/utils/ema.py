"""Weight averaging (reference ``ppsci/utils/ema.py:126,149``) — functional:
averages are pytrees living inside the Solver's TrainState, updated in the
jitted step."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_update", "swa_update", "ExponentialMovingAverage", "StochasticWeightAverage"]


def ema_update(avg_params, params, decay: float):
    """shadow <- decay * shadow + (1 - decay) * params."""
    return jax.tree.map(lambda a, p: decay * a + (1.0 - decay) * p, avg_params, params)


def swa_update(avg_params, params, n_avg):
    """running mean over checkpoints: shadow <- (shadow * n + params)/(n+1)."""
    return jax.tree.map(lambda a, p: (a * n_avg + p) / (n_avg + 1.0), avg_params, params)


class ExponentialMovingAverage:
    """Config holder mirroring the reference class; the Solver applies
    ``ema_update`` inside the train step every ``avg_freq`` steps."""

    kind = "ema"

    def __init__(self, model=None, decay: float = 0.9, avg_freq: int = 1):
        self.decay = decay
        self.avg_freq = avg_freq

    def update_fn(self, avg_params, params, step):
        new = ema_update(avg_params, params, self.decay)
        take = (step % self.avg_freq) == 0
        return jax.tree.map(lambda n, a: jnp.where(take, n, a), new, avg_params)


class StochasticWeightAverage:
    """SWA over the tail of training (reference ema.py:149)."""

    kind = "swa"

    def __init__(self, model=None, avg_freq: int = 1, avg_range=None):
        self.avg_freq = avg_freq
        self.avg_range = avg_range  # (start_step, end_step) or None

    def update_fn(self, avg_params, params, step):
        if self.avg_range is not None:
            start, end = self.avg_range
            in_range = (step >= start) & (step <= end)
        else:
            start, in_range = 0, True
        n_avg = jnp.maximum((step - start) // self.avg_freq, 0).astype(jnp.float32)
        take = in_range & ((step % self.avg_freq) == 0)
        new = swa_update(avg_params, params, n_avg)
        return jax.tree.map(lambda n, a: jnp.where(take, n, a), new, avg_params)
