"""Validators — eval-side mirror of constraints (reference ``ppsci/validate``)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

from paddlescience_tpu import data as data_mod
from paddlescience_tpu.constraint.base import prepare_label, prepare_weight

__all__ = ["Validator", "GeometryValidator", "SupervisedValidator"]


class Validator:
    """Dataset + output expressions + loss + metric dict
    (reference validate/base.py)."""

    def __init__(self, dataset, dataloader_cfg, loss, metric, name: str):
        self.dataset = dataset
        self.data_loader = data_mod.build_dataloader(dataset, dataloader_cfg)
        self.loss = loss
        self.metric = metric or {}
        self.name = name

    def __str__(self):
        return ", ".join(
            [
                self.__class__.__name__,
                f"name = {self.name}",
                f"len(dataloader) = {len(self.data_loader)}",
                f"metric = {list(self.metric.keys())}",
            ]
        )


class GeometryValidator(Validator):
    """Validate expressions against analytic references on sampled geometry
    (reference validate/geo_validator.py:35)."""

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
        metric: Optional[Dict[str, Any]] = None,
        with_initial: bool = False,
        name: Optional[str] = None,
    ):
        self.output_expr = output_expr
        self.label_dict = label_dict
        self.input_keys = geom.dim_keys
        self.output_keys = tuple(label_dict.keys())

        nx = dataloader_cfg["total_size"]
        batch_size = dataloader_cfg.get("batch_size", nx)
        if with_initial and hasattr(geom, "sample_initial_interior"):
            input = geom.sample_initial_interior(nx, random, criteria, evenly)
        else:
            input = geom.sample_interior(nx, random, criteria, evenly)
        label = prepare_label(label_dict, input, geom.dim_keys)

        ds_cfg = dataloader_cfg.get("dataset", {"name": "NamedArrayDataset"})
        if isinstance(ds_cfg, str):
            ds_cfg = {"name": ds_cfg}
        ds_cfg = dict(ds_cfg)
        ds_cfg.update({"input": input, "label": label})
        dataset = data_mod.build_dataset(ds_cfg)
        super().__init__(
            dataset, {"batch_size": batch_size}, loss, metric, name or "GeoValidator"
        )


class SupervisedValidator(Validator):
    """Validate against a supervised dataset (reference validate/sup_validator.py:28)."""

    def __init__(
        self,
        dataloader_cfg: Dict[str, Any],
        loss,
        output_expr: Optional[Dict[str, Callable]] = None,
        metric: Optional[Dict[str, Any]] = None,
        name: Optional[str] = None,
    ):
        dataloader_cfg = dict(dataloader_cfg)
        dataset = data_mod.build_dataset(dataloader_cfg["dataset"])
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
        super().__init__(dataset, dataloader_cfg, loss, metric, name or "SupValidator")


def build_validator(cfg, *args, **kwargs):
    raise NotImplementedError("construct validators directly; config-driven build lands with the full config layer")
