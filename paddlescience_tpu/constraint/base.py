"""Constraint base + label/weight preparation helpers.

TPU-native counterpart of reference ``ppsci/constraint/base.py:29-49`` and
the shared label/weight-evaluation logic of the geometric constraints
(``interior_constraint.py:36-174`` etc.): a constraint binds sampled inputs
(or a dataset), named output expressions, labels/weights and a loss functor
into one training term. The Solver turns each constraint into a slice of the
single jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import numpy as np
import sympy

from paddlescience_tpu import data as data_mod

__all__ = ["Constraint", "prepare_label", "prepare_weight"]


def _np_lambdify(expr: sympy.Basic, dim_keys):
    return sympy.lambdify(
        sympy.symbols(dim_keys),
        expr,
        [{"amax": lambda xy, _: np.maximum(xy[0], xy[1])}, "numpy"],
    )


def prepare_label(label_dict, input: Dict[str, np.ndarray], dim_keys) -> Dict[str, np.ndarray]:
    """Evaluate label spec values (number | sympy expr over coords | callable
    of the input dict) into arrays aligned with the sampled inputs."""
    ref = next(iter(input.values()))
    label = {}
    for key, value in label_dict.items():
        if isinstance(value, (int, float)):
            label[key] = np.full_like(ref, value)
        elif isinstance(value, sympy.Basic):
            func = _np_lambdify(value, dim_keys)
            label[key] = np.asarray(
                func(**{k: v for k, v in input.items() if k in dim_keys}), dtype=ref.dtype
            )
            label[key] = np.broadcast_to(label[key], ref.shape).copy()
        elif callable(value):
            label[key] = value(input)
            if isinstance(label[key], (int, float)):
                label[key] = np.full_like(ref, label[key])
        else:
            raise NotImplementedError(f"type of {type(value)} is invalid yet.")
    return label


def prepare_weight(weight_dict, input, label, dim_keys) -> Optional[Dict[str, np.ndarray]]:
    """Evaluate weight spec values; "sdf" selects the sampled sdf column."""
    if weight_dict is None:
        return None
    ref = next(iter(label.values()))
    weight = {key: np.ones_like(ref) for key in label}
    for key, value in weight_dict.items():
        if isinstance(value, str):
            if value == "sdf":
                weight[key] = input["sdf"]
            else:
                raise NotImplementedError(f"string '{value}' is invalid yet.")
        elif isinstance(value, (int, float)):
            weight[key] = np.full_like(ref, float(value))
        elif isinstance(value, sympy.Basic):
            func = _np_lambdify(value, dim_keys)
            weight[key] = np.broadcast_to(
                np.asarray(func(**{k: v for k, v in input.items() if k in dim_keys}), dtype=ref.dtype),
                ref.shape,
            ).copy()
        elif callable(value):
            weight[key] = value(input)
            if isinstance(weight[key], (int, float)):
                weight[key] = np.full_like(ref, weight[key])
        else:
            raise NotImplementedError(f"type of {type(value)} is invalid yet.")
    return weight


class Constraint:
    """Binds dataset + output expressions + loss into a named training term."""

    def __init__(self, dataset, dataloader_cfg: Optional[Dict[str, Any]], loss, name: str):
        self.dataset = dataset
        self.loss = loss
        self.name = name
        if getattr(dataset, "batch_mode", "indexed") == "device":
            self.data_loader = None
            self.data_iter = None
        else:
            self.data_loader = data_mod.build_dataloader(dataset, dataloader_cfg)
            self.data_iter = iter(self.data_loader)

    def __str__(self):
        return ", ".join(
            [
                self.__class__.__name__,
                f"name = {self.name}",
                f"output_expr = {getattr(self, 'output_expr', None)}",
                f"loss = {self.loss}",
            ]
        )
