"""Learning-rate schedulers.

TPU-native counterparts of reference ``ppsci/optimizer/lr_scheduler.py:41-807``.
Each class mirrors the reference constructor (epochs, iters_per_epoch,
learning_rate, ..., warmup_epoch, by_epoch) and its ``__call__()`` returns a
pure function ``lr(step) -> float`` — exactly an optax schedule, compiled
into the jitted train step (no host-side scheduler.step()).

``by_epoch=True`` means the schedule advances once per epoch: internally the
global step is floored to epochs.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Union

import jax.numpy as jnp

__all__ = [
    "Constant",
    "Linear",
    "Cosine",
    "Step",
    "Piecewise",
    "MultiStepDecay",
    "ExponentialDecay",
    "CosineWarmRestarts",
    "OneCycleLR",
    "LambdaDecay",
    "SchedulerList",
]

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


class LRBase:
    """Reference lr_scheduler.py:41: warmup + by_epoch plumbing."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        warmup_epoch: int,
        warmup_start_lr: float,
        last_epoch: int,
        by_epoch: bool,
    ):
        if warmup_epoch >= epochs:
            warmup_epoch = epochs
        self.epochs = epochs
        self.iters_per_epoch = iters_per_epoch
        self.learning_rate = learning_rate
        self.warmup_epoch = warmup_epoch
        self.by_epoch = by_epoch
        self.warmup_steps = warmup_epoch if by_epoch else round(warmup_epoch * iters_per_epoch)
        self.warmup_start_lr = warmup_start_lr
        self.last_epoch = last_epoch

    def _t(self, step):
        """schedule time: epochs if by_epoch else iters."""
        return step // self.iters_per_epoch if self.by_epoch else step

    def _wrap_warmup(self, base: Schedule) -> Schedule:
        """Linear warmup, then `base` evaluated on the REBASED clock
        (step - warmup): the decay counter starts after warmup ends,
        matching the reference's LinearWarmup semantics
        (``ppsci/optimizer/lr_scheduler.py:41-120``; ADVICE r1)."""
        if self.warmup_steps <= 0:
            return base
        ws, start, end = self.warmup_steps, self.warmup_start_lr, self.learning_rate
        # raw-step offset equivalent to ws schedule-time units
        shift = ws * self.iters_per_epoch if self.by_epoch else ws

        def sched(step):
            t = self._t(step)
            warm = start + (end - start) * jnp.minimum(t / ws, 1.0)
            return jnp.where(t < ws, warm, base(jnp.maximum(step - shift, 0)))

        return sched

    def get_lr_fn(self) -> Schedule:
        raise NotImplementedError

    def __call__(self) -> Schedule:
        fn = self._wrap_warmup(self.get_lr_fn())
        fn.by_epoch = self.by_epoch
        return fn


class Constant:
    """Constant lr (reference lr_scheduler.py:124)."""

    def __init__(self, learning_rate: float, last_epoch: int = -1):
        self.learning_rate = learning_rate

    def __call__(self) -> Schedule:
        lr = self.learning_rate
        return lambda step: jnp.asarray(lr, jnp.float32)


class Linear(LRBase):
    """Linear decay to end_lr over epochs (reference lr_scheduler.py:140)."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        end_lr: float = 0.0,
        power: float = 1.0,
        cycle: bool = False,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.decay_steps = (epochs - self.warmup_epoch) * iters_per_epoch
        if by_epoch:
            self.decay_steps = epochs - self.warmup_epoch
        self.end_lr = end_lr
        self.power = power

    def get_lr_fn(self):
        lr0, end_lr, power, ds = self.learning_rate, self.end_lr, self.power, max(self.decay_steps, 1)

        def sched(step):
            t = jnp.minimum(self._t(step), ds)
            return (lr0 - end_lr) * (1 - t / ds) ** power + end_lr

        return sched


class Cosine(LRBase):
    """Cosine decay to eta_min (reference lr_scheduler.py:272).

    Examples:
        >>> from paddlescience_tpu.optimizer import lr_scheduler
        >>> sched = lr_scheduler.Cosine(
        ...     epochs=10, iters_per_epoch=100, learning_rate=1e-3)()
        >>> round(float(sched(0)), 6)   # pure fn of the global step
        0.001
        >>> round(float(sched(999)), 8) # decayed to eta_min by the last step
        0.0
    """

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        eta_min: float = 0.0,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.T_max = (epochs - self.warmup_epoch) * iters_per_epoch if not by_epoch else (epochs - self.warmup_epoch)
        self.eta_min = eta_min

    def get_lr_fn(self):
        # no warmup subtraction here: _wrap_warmup rebases the clock
        lr0, eta_min, T = self.learning_rate, self.eta_min, max(self.T_max, 1)

        def sched(step):
            t = jnp.clip(self._t(step), 0, T)
            return eta_min + 0.5 * (lr0 - eta_min) * (1 + jnp.cos(jnp.pi * t / T))

        return sched


class Step(LRBase):
    """lr * gamma^(t // step_size) (reference lr_scheduler.py:337)."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        step_size: int,
        gamma: float,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.step_size = step_size if by_epoch else step_size * iters_per_epoch
        if by_epoch:
            self.step_size = step_size
        self.gamma = gamma

    def get_lr_fn(self):
        lr0, g, ss = self.learning_rate, self.gamma, max(self.step_size, 1)
        return lambda step: lr0 * g ** (self._t(step) // ss)


class Piecewise(LRBase):
    """Piecewise-constant lr over epoch boundaries (reference lr_scheduler.py:399)."""

    def __init__(
        self,
        iters_per_epoch: int,
        decay_epochs: Sequence[int],
        values: Sequence[float],
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
        epochs: Optional[int] = None,
    ):
        epochs = epochs if epochs is not None else (max(decay_epochs) + 1 if decay_epochs else 1)
        super().__init__(epochs, iters_per_epoch, values[0], warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.boundaries = [e if by_epoch else e * iters_per_epoch for e in decay_epochs]
        self.values = list(values)

    def get_lr_fn(self):
        bounds = jnp.array(self.boundaries)
        vals = jnp.array(self.values)

        def sched(step):
            t = self._t(step)
            idx = jnp.sum(t >= bounds)
            return vals[jnp.minimum(idx, len(self.values) - 1)]

        return sched


class MultiStepDecay(LRBase):
    """gamma decay at each milestone (reference lr_scheduler.py:461)."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        milestones: Sequence[int],
        gamma: float = 0.1,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.milestones = [m if by_epoch else m * iters_per_epoch for m in milestones]
        self.gamma = gamma

    def get_lr_fn(self):
        ms = jnp.array(self.milestones)
        lr0, g = self.learning_rate, self.gamma

        def sched(step):
            t = self._t(step)
            return lr0 * g ** jnp.sum(t >= ms)

        return sched


class ExponentialDecay(LRBase):
    """lr0 * gamma^(t / decay_steps), smooth per-step decay
    (reference lr_scheduler.py:212: per-step gamma = gamma^(1/decay_steps))."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        gamma: float,
        decay_steps: int,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.decay_steps = decay_steps / iters_per_epoch if by_epoch else decay_steps
        self.gamma = gamma

    def get_lr_fn(self):
        lr0, g, ds = self.learning_rate, self.gamma, self.decay_steps

        def sched(step):
            t = self._t(step)
            return lr0 * g ** (t / ds)

        return sched


class CosineWarmRestarts(LRBase):
    """SGDR cosine annealing with warm restarts (reference lr_scheduler.py:596)."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        T_0: int,
        T_mult: int = 1,
        eta_min: float = 0.0,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.T_0 = T_0 if by_epoch else T_0 * iters_per_epoch
        if by_epoch:
            self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def get_lr_fn(self):
        lr0, eta_min, T0, mult = self.learning_rate, self.eta_min, max(self.T_0, 1), self.T_mult

        def sched(step):
            t = self._t(step).astype(jnp.float32) if hasattr(self._t(step), "astype") else float(self._t(step))
            if mult == 1:
                t_cur = jnp.mod(t, T0)
                T_i = T0
            else:
                # closed form: find restart index n with T0*(mult^n - 1)/(mult-1) <= t
                n = jnp.floor(jnp.log(t / T0 * (mult - 1) + 1) / math.log(mult))
                start = T0 * (mult**n - 1) / (mult - 1)
                T_i = T0 * mult**n
                t_cur = t - start
            return eta_min + 0.5 * (lr0 - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / T_i))

        return sched


# reference exposes both names (lr_scheduler.py:523,596)
CosineAnnealingWarmRestarts = CosineWarmRestarts


class OneCycleLR(LRBase):
    """One-cycle policy (reference lr_scheduler.py:661): ramp to max_lr at
    pct_start, then anneal to max_lr/divide_factor (cos or linear)."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        max_learning_rate: float,
        divide_factor: float = 25.0,
        end_learning_rate: float = 0.0001,
        phase_pct: float = 0.3,
        anneal_strategy: str = "cos",
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, max_learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.total_steps = epochs if by_epoch else epochs * iters_per_epoch
        self.max_lr = max_learning_rate
        self.initial_lr = max_learning_rate / divide_factor
        self.end_lr = end_learning_rate
        self.phase_pct = phase_pct
        self.anneal_strategy = anneal_strategy

    def get_lr_fn(self):
        up_steps = max(int(self.phase_pct * self.total_steps), 1)
        down_steps = max(self.total_steps - up_steps, 1)
        lr_i, lr_max, lr_end = self.initial_lr, self.max_lr, self.end_lr
        cos_mode = self.anneal_strategy == "cos"

        def _anneal(frac, a, b):
            if cos_mode:
                return b + (a - b) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
            return a + (b - a) * frac

        def sched(step):
            t = self._t(step)
            up = _anneal(jnp.clip(t / up_steps, 0, 1), lr_i, lr_max) if not cos_mode else _anneal(
                1 - jnp.clip(t / up_steps, 0, 1), lr_max, lr_i
            )
            down = _anneal(jnp.clip((t - up_steps) / down_steps, 0, 1), lr_max, lr_end)
            return jnp.where(t < up_steps, up, down)

        return sched


class LambdaDecay(LRBase):
    """lr0 * lr_lambda(t) (reference lr_scheduler.py:744)."""

    def __init__(
        self,
        epochs: int,
        iters_per_epoch: int,
        learning_rate: float,
        lr_lambda: Callable,
        warmup_epoch: int = 0,
        warmup_start_lr: float = 0.0,
        last_epoch: int = -1,
        by_epoch: bool = False,
    ):
        super().__init__(epochs, iters_per_epoch, learning_rate, warmup_epoch, warmup_start_lr, last_epoch, by_epoch)
        self.lr_lambda = lr_lambda

    def get_lr_fn(self):
        lr0, fn = self.learning_rate, self.lr_lambda
        return lambda step: lr0 * fn(self._t(step))


class SchedulerList:
    """Bundle of schedules for OptimizerList (reference lr_scheduler.py:807)."""

    def __init__(self, scheduler_list: List[Schedule]):
        self.scheduler_list = list(scheduler_list)

    def __getitem__(self, i):
        return self.scheduler_list[i]

    def __len__(self):
        return len(self.scheduler_list)
