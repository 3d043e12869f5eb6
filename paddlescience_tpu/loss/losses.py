"""Pointwise loss zoo.

TPU-native counterparts of the reference loss classes:
  * MSELoss / CausalMSELoss / MSELossWithL2Decay (ppsci/loss/mse.py:28,109,192)
  * L1Loss / PeriodicL1Loss                      (ppsci/loss/l1.py:32,123)
  * L2Loss / PeriodicL2Loss / L2RelLoss          (ppsci/loss/l2.py:28-218)
  * MAELoss                                      (ppsci/loss/mae.py)
  * KLLoss                                       (ppsci/loss/kl.py)
  * ChamferLoss                                  (ppsci/loss/chamfer.py)
  * IntegralLoss                                 (ppsci/loss/integral.py:31)
  * FunctionalLoss                               (ppsci/loss/func.py:27)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.loss.base import Loss

__all__ = [
    "MSELoss",
    "CausalMSELoss",
    "MSELossWithL2Decay",
    "L1Loss",
    "PeriodicL1Loss",
    "L2Loss",
    "PeriodicL2Loss",
    "L2RelLoss",
    "MAELoss",
    "KLLoss",
    "ChamferLoss",
    "IntegralLoss",
    "FunctionalLoss",
]


def _elementwise(output_dict, label_dict, weight_dict, key, fn):
    loss = fn(output_dict[key], label_dict[key])
    if weight_dict and key in weight_dict:
        loss = loss * weight_dict[key]
    if "area" in output_dict:
        loss = loss * output_dict["area"]
    return loss


class MSELoss(Loss):
    """Mean squared error (reference mse.py:28).

    Examples:
        >>> import jax.numpy as jnp
        >>> import paddlescience_tpu as psci
        >>> loss = psci.loss.MSELoss()
        >>> out = loss({"u": jnp.ones((4, 1))}, {"u": jnp.zeros((4, 1))})
        >>> float(out["u"])
        1.0
    """

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            loss = _elementwise(output_dict, label_dict, weight_dict, key, lambda o, l: (o - l) ** 2)
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class CausalMSELoss(Loss):
    """Temporal-causality weighted MSE (reference mse.py:109-192):
    residual batch is reshaped to (n_chunks, -1) along a *time-sorted* leading
    axis; chunk i is weighted w_i = exp(-tol * sum_{k<i} mean L_k), detached.
    """

    def __init__(
        self,
        n_chunks: int,
        reduction: str = "mean",
        weight: Optional[Union[float, Dict[str, float]]] = None,
        tol: float = 1.0,
    ):
        if n_chunks <= 0:
            raise ValueError(f"n_chunks should be positive, but got {n_chunks}")
        super().__init__(reduction, weight)
        self.n_chunks = n_chunks
        self.tol = tol
        # strictly-lower-triangular accumulation matrix
        self.acc_mat = jnp.tril(jnp.ones((n_chunks, n_chunks)), -1)

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            loss = _elementwise(output_dict, label_dict, weight_dict, key, lambda o, l: (o - l) ** 2)
            loss_t = loss.reshape(self.n_chunks, -1)  # [nt, nx]
            weight_t = jnp.exp(-self.tol * (self.acc_mat @ jnp.mean(loss_t, axis=-1, keepdims=True)))
            loss = loss_t * jax.lax.stop_gradient(weight_t)
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class MSELossWithL2Decay(MSELoss):
    """MSE + L2 penalty on named output fields (reference mse.py:192)."""

    def __init__(self, reduction="mean", regularization_dict: Optional[Dict[str, float]] = None, weight=None):
        super().__init__(reduction, weight)
        self.regularization_dict = regularization_dict

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = super().__call__(output_dict, label_dict, weight_dict)
        if self.regularization_dict:
            for reg_key, reg_factor in self.regularization_dict.items():
                losses[reg_key] = losses.get(reg_key, 0.0) + reg_factor * jnp.sum(output_dict[reg_key] ** 2)
        return losses


class L1Loss(Loss):
    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            loss = _elementwise(output_dict, label_dict, weight_dict, key, lambda o, l: jnp.abs(o - l))
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class PeriodicL1Loss(Loss):
    """L1 between the first and second halves of the batch (periodic BC pairs,
    reference l1.py:123)."""

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            n = output_dict[key].shape[0]
            if n % 2 > 0:
                raise ValueError(f"batch size of key({key}) must be even for periodic loss, got {n}")
            lhs, rhs = output_dict[key][: n // 2], output_dict[key][n // 2 :]
            loss = jnp.abs(lhs - rhs)
            if weight_dict and key in weight_dict:
                loss = loss * weight_dict[key]
            if "area" in output_dict:
                loss = loss * output_dict["area"][: n // 2]
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class L2Loss(Loss):
    """Per-sample L2 norm of the error vector, reduced over the batch
    (reference l2.py:28)."""

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            err = output_dict[key] - label_dict[key]
            if weight_dict and key in weight_dict:
                err = err * weight_dict[key]
            loss = jnp.linalg.norm(err, axis=-1)
            if "area" in output_dict:
                loss = loss * output_dict["area"][..., 0]
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class PeriodicL2Loss(Loss):
    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            n = output_dict[key].shape[0]
            if n % 2 > 0:
                raise ValueError(f"batch size of key({key}) must be even for periodic loss, got {n}")
            err = output_dict[key][: n // 2] - output_dict[key][n // 2 :]
            loss = jnp.linalg.norm(err, axis=-1)
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class L2RelLoss(Loss):
    """Batch relative L2: ||o - l|| / ||l|| (reference l2.py:218)."""

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            o = output_dict[key].reshape(output_dict[key].shape[0], -1)
            l = label_dict[key].reshape(label_dict[key].shape[0], -1)
            rel = jnp.linalg.norm(o - l, axis=-1) / (jnp.linalg.norm(l, axis=-1) + 1e-12)
            if weight_dict and key in weight_dict:
                rel = rel * weight_dict[key]
            losses[key] = self._apply_weight(self._reduce(rel), key)
        return losses


class MAELoss(Loss):
    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            loss = _elementwise(output_dict, label_dict, weight_dict, key, lambda o, l: jnp.abs(o - l))
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class KLLoss(Loss):
    """KL(softmax(label) || softmax(output)) along the last axis."""

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            logp = jax.nn.log_softmax(output_dict[key], axis=-1)
            q = jax.nn.softmax(label_dict[key], axis=-1)
            loss = jnp.sum(q * (jnp.log(q + 1e-12) - logp), axis=-1)
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class ChamferLoss(Loss):
    """Symmetric Chamfer distance between point sets (B, N, D) vs (B, M, D)."""

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            o, l = output_dict[key], label_dict[key]
            d2 = jnp.sum((o[:, :, None, :] - l[:, None, :, :]) ** 2, axis=-1)  # (B, N, M)
            loss = jnp.mean(jnp.min(d2, axis=2), axis=1) + jnp.mean(jnp.min(d2, axis=1), axis=1)
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class IntegralLoss(Loss):
    """Monte-Carlo integral matching: mean((sum_i o_i * area_i - l)^2)
    (reference integral.py:31)."""

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        losses = {}
        for key in label_dict:
            integral = jnp.sum(output_dict[key] * output_dict["area"], axis=1)
            loss = (integral - label_dict[key]) ** 2
            if weight_dict and key in weight_dict:
                loss = loss * weight_dict[key]
            losses[key] = self._apply_weight(self._reduce(loss), key)
        return losses


class FunctionalLoss(Loss):
    """Wrap a user function (output_dict, label_dict, weight_dict) -> dict of
    scalars (reference func.py:27)."""

    def __init__(self, loss_expr: Callable, weight=None):
        super().__init__("mean", weight)
        self.loss_expr = loss_expr

    def __call__(self, output_dict, label_dict=None, weight_dict=None) -> Dict[str, jnp.ndarray]:
        result = self.loss_expr(output_dict, label_dict, weight_dict)
        if not isinstance(result, dict):
            result = {"loss": result}
        return result
