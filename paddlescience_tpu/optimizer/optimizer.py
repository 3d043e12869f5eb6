"""Optimizers.

TPU-native counterparts of reference ``ppsci/optimizer/optimizer.py:39-498``:
factory-style wrappers — ``Adam(lr)(model)`` — that build **optax**
gradient transformations. The returned ``Optimizer`` object carries the
optax ``tx``, the schedule function, and grad-clip config; the Solver owns
the opt state inside its TrainState pytree.

L-BFGS uses ``optax.lbfgs`` with zoom line search; the Solver runs it with
the value_and_grad-from-state closure pattern (the reference's
``train_LBFGS_epoch_func``, solver/train.py:216-319).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import optax

__all__ = ["Optimizer", "SGD", "Momentum", "Adam", "AdamW", "RMSProp", "LBFGS", "OptimizerList"]

Schedule = Union[float, Callable]


def _as_schedule(lr: Schedule) -> Callable:
    if callable(lr):
        return lr
    return lambda step: lr


class Optimizer:
    """Holds an optax transformation + schedule; created by calling a factory
    on the model (reference pattern `Adam(lr)(model)`)."""

    def __init__(self, tx: optax.GradientTransformation, lr_fn: Callable, name: str, is_lbfgs: bool = False):
        self.tx = tx
        self.lr_fn = lr_fn
        self.name = name
        self.is_lbfgs = is_lbfgs

    def init(self, params):
        return self.tx.init(params)

    def __str__(self):
        return f"Optimizer({self.name})"


def _clip(grad_clip: Optional[dict]):
    """grad_clip: {"name": "global_norm"|"norm"|"value", "clip_norm"/"clip_value": float}"""
    if not grad_clip:
        return None
    name = grad_clip.get("name", "global_norm")
    if name in ("global_norm", "ClipGradByGlobalNorm"):
        return optax.clip_by_global_norm(grad_clip["clip_norm"])
    if name in ("norm", "ClipGradByNorm"):
        return optax.clip_by_block_rms(grad_clip["clip_norm"])
    if name in ("value", "ClipGradByValue"):
        return optax.clip(grad_clip["clip_value"])
    raise ValueError(f"unknown grad_clip '{name}'")


def _chain(base: optax.GradientTransformation, grad_clip, weight_decay_tx=None):
    parts = []
    clip = _clip(grad_clip)
    if clip is not None:
        parts.append(clip)
    if weight_decay_tx is not None:
        parts.append(weight_decay_tx)
    parts.append(base)
    return optax.chain(*parts) if len(parts) > 1 else base


class SGD:
    """reference optimizer.py:39."""

    def __init__(self, learning_rate: Schedule = 0.001, weight_decay: Optional[float] = None, grad_clip=None):
        self.lr_fn = _as_schedule(learning_rate)
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip

    def __call__(self, *models) -> Optimizer:
        wd = optax.add_decayed_weights(self.weight_decay) if self.weight_decay else None
        tx = _chain(optax.sgd(self.lr_fn), self.grad_clip, wd)
        return Optimizer(tx, self.lr_fn, "SGD")


class Momentum:
    """reference optimizer.py:86."""

    def __init__(
        self,
        learning_rate: Schedule,
        momentum: float = 0.9,
        weight_decay: Optional[float] = None,
        grad_clip=None,
        use_nesterov: bool = False,
    ):
        self.lr_fn = _as_schedule(learning_rate)
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip
        self.use_nesterov = use_nesterov

    def __call__(self, *models) -> Optimizer:
        wd = optax.add_decayed_weights(self.weight_decay) if self.weight_decay else None
        tx = _chain(optax.sgd(self.lr_fn, momentum=self.momentum, nesterov=self.use_nesterov), self.grad_clip, wd)
        return Optimizer(tx, self.lr_fn, "Momentum")


class Adam:
    """reference optimizer.py:179."""

    def __init__(
        self,
        learning_rate: Schedule = 0.001,
        beta1: float = 0.9,
        beta2: float = 0.999,
        epsilon: float = 1e-8,
        weight_decay: Optional[float] = None,
        grad_clip=None,
        amsgrad: bool = False,
    ):
        self.lr_fn = _as_schedule(learning_rate)
        self.betas = (beta1, beta2)
        self.epsilon = epsilon
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip
        self.amsgrad = amsgrad

    def __call__(self, *models) -> Optimizer:
        base = (
            optax.amsgrad(self.lr_fn, b1=self.betas[0], b2=self.betas[1], eps=self.epsilon)
            if self.amsgrad
            else optax.adam(self.lr_fn, b1=self.betas[0], b2=self.betas[1], eps=self.epsilon)
        )
        wd = optax.add_decayed_weights(self.weight_decay) if self.weight_decay else None
        return Optimizer(_chain(base, self.grad_clip, wd), self.lr_fn, "Adam")


class AdamW:
    """reference optimizer.py:386."""

    def __init__(
        self,
        learning_rate: Schedule = 0.001,
        beta1: float = 0.9,
        beta2: float = 0.999,
        epsilon: float = 1e-8,
        weight_decay: float = 0.01,
        grad_clip=None,
    ):
        self.lr_fn = _as_schedule(learning_rate)
        self.betas = (beta1, beta2)
        self.epsilon = epsilon
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip

    def __call__(self, *models) -> Optimizer:
        base = optax.adamw(
            self.lr_fn, b1=self.betas[0], b2=self.betas[1], eps=self.epsilon, weight_decay=self.weight_decay
        )
        return Optimizer(_chain(base, self.grad_clip), self.lr_fn, "AdamW")


class RMSProp:
    """reference optimizer.py:326."""

    def __init__(
        self,
        learning_rate: Schedule,
        rho: float = 0.95,
        epsilon: float = 1e-6,
        momentum: float = 0.0,
        weight_decay: Optional[float] = None,
        grad_clip=None,
    ):
        self.lr_fn = _as_schedule(learning_rate)
        self.rho = rho
        self.epsilon = epsilon
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip

    def __call__(self, *models) -> Optimizer:
        base = optax.rmsprop(self.lr_fn, decay=self.rho, eps=self.epsilon, momentum=self.momentum)
        wd = optax.add_decayed_weights(self.weight_decay) if self.weight_decay else None
        return Optimizer(_chain(base, self.grad_clip, wd), self.lr_fn, "RMSProp")


class LBFGS:
    """Full-batch L-BFGS with zoom line search (reference optimizer.py:251).

    max_iter line-search evaluations per ``step`` are handled by optax's
    value_and_grad_from_state pattern in the Solver's LBFGS loop.
    """

    def __init__(
        self,
        learning_rate: float = 1.0,
        max_iter: int = 20,
        max_eval: Optional[int] = None,
        tolerance_grad: float = 1e-8,
        tolerance_change: float = 1e-9,
        history_size: int = 100,
        line_search_fn: Optional[str] = "strong_wolfe",
    ):
        self.learning_rate = learning_rate
        self.max_iter = max_iter
        self.history_size = history_size
        self.tolerance_grad = tolerance_grad
        self.tolerance_change = tolerance_change
        self.line_search_fn = line_search_fn

    def __call__(self, *models) -> Optimizer:
        linesearch = (
            optax.scale_by_zoom_linesearch(max_linesearch_steps=self.max_iter)
            if self.line_search_fn == "strong_wolfe"
            else None
        )
        tx = optax.lbfgs(
            learning_rate=self.learning_rate if self.line_search_fn != "strong_wolfe" else None,
            memory_size=self.history_size,
            linesearch=linesearch,
        )
        return Optimizer(tx, _as_schedule(self.learning_rate), "LBFGS", is_lbfgs=True)


class OptimizerList:
    """Multiple optimizers for multiple models (GAN training; reference
    optimizer.py:498). Holds (optimizer, model_filter) pairs; Solver applies
    optax.multi_transform over labeled parameter groups."""

    def __init__(self, optimizer_list: List[Optimizer]):
        self.optimizer_list = list(optimizer_list)
        self.lr_fn = optimizer_list[0].lr_fn
        self.is_lbfgs = any(getattr(o, "is_lbfgs", False) for o in optimizer_list)

    def __getitem__(self, i):
        return self.optimizer_list[i]

    def __len__(self):
        return len(self.optimizer_list)
