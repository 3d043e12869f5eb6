"""Loss base class (reference ``ppsci/loss/base.py:25``).

All losses are pure dict-in/dict-out functions of jnp arrays: they trace into
the jitted train step. Contract (identical to the reference):
``loss(output_dict, label_dict, weight_dict=None) -> {key: scalar}`` with
optional per-key static weights, per-sample weight_dict arrays, and implicit
``output_dict["area"]`` integral weighting.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp

__all__ = ["Loss"]


class Loss:
    def __init__(
        self,
        reduction: str = "mean",
        weight: Optional[Union[float, Dict[str, float]]] = None,
    ):
        if reduction not in ("mean", "sum"):
            raise ValueError(f"reduction should be 'mean' or 'sum', but got {reduction}")
        self.reduction = reduction
        self.weight = weight

    def _reduce(self, loss: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(loss) if self.reduction == "sum" else jnp.mean(loss)

    def _apply_weight(self, loss: jnp.ndarray, key: str) -> jnp.ndarray:
        if isinstance(self.weight, (float, int)):
            return loss * self.weight
        if isinstance(self.weight, dict) and key in self.weight:
            return loss * self.weight[key]
        return loss

    def __call__(self, output_dict, label_dict, weight_dict=None) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def __str__(self):
        return f"{self.__class__.__name__}(reduction={self.reduction}, weight={self.weight})"
