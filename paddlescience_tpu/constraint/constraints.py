"""Constraint zoo.

TPU-native counterparts of the reference constraints:
  * InteriorConstraint    (ppsci/constraint/interior_constraint.py:36-174)
  * BoundaryConstraint    (ppsci/constraint/boundary_constraint.py)
  * InitialConstraint     (ppsci/constraint/initial_constraint.py)
  * PeriodicConstraint    (ppsci/constraint/periodic_constraint.py)
  * IntegralConstraint    (ppsci/constraint/integral_constraint.py)
  * SupervisedConstraint  (ppsci/constraint/supervised_constraint.py)

Geometry sampling happens host-side at build time (static shapes); the
sampled arrays become a dataset feeding the jitted step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import numpy as np

from paddlescience_tpu import data as data_mod
from paddlescience_tpu.constraint.base import Constraint, prepare_label, prepare_weight

__all__ = [
    "InteriorConstraint",
    "BoundaryConstraint",
    "InitialConstraint",
    "PeriodicConstraint",
    "IntegralConstraint",
    "SupervisedConstraint",
]


def _build_geom_dataset(input, label, weight, dataloader_cfg):
    dataloader_cfg = dict(dataloader_cfg)
    ds_cfg = dataloader_cfg.get("dataset", "NamedArrayDataset")
    if isinstance(ds_cfg, str):
        ds_cfg = {"name": ds_cfg}
    ds_cfg = dict(ds_cfg)
    ds_cfg.update({"input": input, "label": label, "weight": weight})
    return data_mod.build_dataset(ds_cfg), dataloader_cfg


class InteriorConstraint(Constraint):
    """PDE residual over interior collocation points."""

    def __init__(
        self,
        output_expr: Dict[str, Callable],
        label_dict: Dict[str, Union[float, Callable]],
        geom,
        dataloader_cfg: Dict[str, Any],
        loss,
        random: str = "pseudo",
        criteria: Optional[Callable] = None,
        evenly: bool = False,
        weight_dict: Optional[Dict[str, Union[Callable, float]]] = None,
        compute_sdf_derivatives: bool = False,
        name: str = "EQ",
    ):
        self.label_dict = label_dict
        self.input_keys = geom.dim_keys
        self.output_keys = tuple(label_dict.keys())
        self.output_expr = {k: v for k, v in output_expr.items() if k in self.output_keys}
        if isinstance(criteria, str):
            criteria = eval(criteria)  # noqa: S307 — reference-compatible config strings

        n = dataloader_cfg["batch_size"] * dataloader_cfg.get("iters_per_epoch", 1)
        input = geom.sample_interior(n, random, criteria, evenly, compute_sdf_derivatives)
        label = prepare_label(label_dict, input, geom.dim_keys)
        weight = prepare_weight(weight_dict, input, label, geom.dim_keys)
        dataset, dataloader_cfg = _build_geom_dataset(input, label, weight, dataloader_cfg)
        super().__init__(dataset, dataloader_cfg, loss, name)


class BoundaryConstraint(Constraint):
    """Dirichlet/Neumann/Robin terms over boundary points (normals provided
    in the input dict as normal_x/normal_y/...)."""

    def __init__(
        self,
        output_expr: Dict[str, Callable],
        label_dict: Dict[str, Union[float, Callable]],
        geom,
        dataloader_cfg: Dict[str, Any],
        loss,
        random: str = "pseudo",
        criteria: Optional[Callable] = None,
        evenly: bool = False,
        weight_dict: Optional[Dict[str, Union[Callable, float]]] = None,
        name: str = "BC",
    ):
        self.label_dict = label_dict
        self.input_keys = geom.dim_keys
        self.output_keys = tuple(label_dict.keys())
        self.output_expr = {k: v for k, v in output_expr.items() if k in self.output_keys}
        if isinstance(criteria, str):
            criteria = eval(criteria)  # noqa: S307

        n = dataloader_cfg["batch_size"] * dataloader_cfg.get("iters_per_epoch", 1)
        input = geom.sample_boundary(n, random, criteria, evenly)
        label = prepare_label(label_dict, input, geom.dim_keys)
        weight = prepare_weight(weight_dict, input, label, geom.dim_keys)
        dataset, dataloader_cfg = _build_geom_dataset(input, label, weight, dataloader_cfg)
        super().__init__(dataset, dataloader_cfg, loss, name)


class InitialConstraint(Constraint):
    """IC over interior points at t = t0 (TimeXGeometry)."""

    def __init__(
        self,
        output_expr: Dict[str, Callable],
        label_dict: Dict[str, Union[float, Callable]],
        geom,
        dataloader_cfg: Dict[str, Any],
        loss,
        random: str = "pseudo",
        criteria: Optional[Callable] = None,
        evenly: bool = False,
        weight_dict: Optional[Dict[str, Union[Callable, float]]] = None,
        compute_sdf_derivatives: bool = False,
        name: str = "IC",
    ):
        self.label_dict = label_dict
        self.input_keys = geom.dim_keys
        self.output_keys = tuple(label_dict.keys())
        self.output_expr = {k: v for k, v in output_expr.items() if k in self.output_keys}
        if isinstance(criteria, str):
            criteria = eval(criteria)  # noqa: S307

        n = dataloader_cfg["batch_size"] * dataloader_cfg.get("iters_per_epoch", 1)
        input = geom.sample_initial_interior(n, random, criteria, evenly, compute_sdf_derivatives)
        label = prepare_label(label_dict, input, geom.dim_keys)
        weight = prepare_weight(weight_dict, input, label, geom.dim_keys)
        dataset, dataloader_cfg = _build_geom_dataset(input, label, weight, dataloader_cfg)
        super().__init__(dataset, dataloader_cfg, loss, name)


class PeriodicConstraint(Constraint):
    """Ties u(x) to u(x_periodic): batch is [points; periodic images] and the
    loss is a Periodic* loss comparing the two halves
    (reference periodic_constraint.py)."""

    def __init__(
        self,
        output_expr: Dict[str, Callable],
        label_dict: Dict[str, Union[float, Callable]],
        geom,
        periodic_key: str,
        dataloader_cfg: Dict[str, Any],
        loss,
        random: str = "pseudo",
        criteria: Optional[Callable] = None,
        evenly: bool = False,
        weight_dict: Optional[Dict[str, Union[Callable, float]]] = None,
        name: str = "PeriodicBC",
    ):
        self.label_dict = label_dict
        self.input_keys = geom.dim_keys
        self.output_keys = tuple(output_expr.keys())
        self.output_expr = output_expr
        if isinstance(criteria, str):
            criteria = eval(criteria)  # noqa: S307

        n_half = (dataloader_cfg["batch_size"] // 2) * dataloader_cfg.get("iters_per_epoch", 1)
        component = geom.dim_keys.index(periodic_key) - int("t" in geom.dim_keys)
        input = geom.sample_boundary(n_half, random, criteria, evenly)
        input_coords = {k: input[k] for k in geom.dim_keys}
        mirrored = geom.periodic_point(input_coords, component)
        full_input = {
            k: np.concatenate([input_coords[k], mirrored[k]], axis=0) for k in geom.dim_keys
        }
        label = prepare_label({k: 0.0 for k in output_expr}, full_input, geom.dim_keys)
        weight = prepare_weight(weight_dict, full_input, label, geom.dim_keys)
        dataset, dataloader_cfg = _build_geom_dataset(full_input, label, weight, dataloader_cfg)
        super().__init__(dataset, dataloader_cfg, loss, name)


class IntegralConstraint(Constraint):
    """Monte-Carlo integral constraints: each 'sample' is a set of boundary
    points whose integral must match a scalar label (reference
    integral_constraint.py). Input arrays have shape (batch, n_points, d)."""

    def __init__(
        self,
        output_expr: Dict[str, Callable],
        label_dict: Dict[str, Union[float, Callable]],
        geom,
        dataloader_cfg: Dict[str, Any],
        loss,
        random: str = "pseudo",
        criteria: Optional[Callable] = None,
        weight_dict: Optional[Dict[str, Union[Callable, float]]] = None,
        integral_batch_size: int = 1024,
        name: str = "IgC",
    ):
        self.label_dict = label_dict
        self.input_keys = geom.dim_keys
        self.output_keys = tuple(label_dict.keys())
        self.output_expr = {k: v for k, v in output_expr.items() if k in self.output_keys}
        if isinstance(criteria, str):
            criteria = eval(criteria)  # noqa: S307

        n_sets = dataloader_cfg["batch_size"] * dataloader_cfg.get("iters_per_epoch", 1)
        samples = [geom.sample_boundary(integral_batch_size, random, criteria) for _ in range(n_sets)]
        input = {
            k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]
        }  # (n_sets, m, 1)
        # area column: uniform MC weight = |boundary| / m
        perimeter = getattr(geom, "perimeter", None) or getattr(geom, "area", 1.0)
        input["area"] = np.full(
            (n_sets, integral_batch_size, 1), perimeter / integral_batch_size, dtype=np.float32
        )
        ref = np.zeros((n_sets, 1), np.float32)
        label = {}
        for key, value in label_dict.items():
            if isinstance(value, (int, float)):
                label[key] = np.full_like(ref, value)
            elif callable(value):
                label[key] = np.asarray(value(input), np.float32).reshape(n_sets, 1)
            else:
                raise NotImplementedError(f"integral label of type {type(value)} unsupported")
        weight = prepare_weight(weight_dict, input, label, geom.dim_keys)
        dataset, dataloader_cfg = _build_geom_dataset(input, label, weight, dataloader_cfg)
        super().__init__(dataset, dataloader_cfg, loss, name)


class SupervisedConstraint(Constraint):
    """Data-driven constraint over a configured dataset
    (reference supervised_constraint.py)."""

    def __init__(
        self,
        dataloader_cfg: Dict[str, Any],
        loss,
        output_expr: Optional[Dict[str, Callable]] = None,
        name: str = "Sup",
    ):
        dataloader_cfg = dict(dataloader_cfg)
        ds_cfg = dataloader_cfg["dataset"]
        if not isinstance(ds_cfg, dict):
            raise TypeError("dataloader_cfg['dataset'] must be a config dict")
        dataset = data_mod.build_dataset(ds_cfg)
        self.output_expr = output_expr
        if hasattr(dataset, "input"):
            self.input_keys = tuple(dataset.input.keys())
        self.output_keys = (
            tuple(output_expr.keys())
            if output_expr is not None
            else tuple(getattr(dataset, "label", {}).keys())
        )
        if self.output_expr is None:
            self.output_expr = {key: (lambda out, k=key: out[k]) for key in self.output_keys}
        super().__init__(dataset, dataloader_cfg, loss, name)
