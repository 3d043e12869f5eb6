"""Eval metrics (reference ``ppsci/metric``): dict-in/dict-out with the
``keep_batch`` protocol. Pure jnp functions, usable inside or outside jit."""

from __future__ import annotations

import copy
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Metric",
    "L2Rel",
    "MeanL2Rel",
    "MAE",
    "MSE",
    "RMSE",
    "MaxAE",
    "LatitudeWeightedACC",
    "LatitudeWeightedRMSE",
    "FunctionalMetric",
    "build_metric",
]


class Metric:
    """Base (reference metric/base.py:20)."""

    def __init__(self, keep_batch: bool = False):
        self.keep_batch = keep_batch

    def __call__(self, output_dict, label_dict) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError


class L2Rel(Metric):
    """||o - l||_2 / ||l||_2 over the flattened arrays (reference l2_rel.py:25).

    Examples:
        >>> import jax.numpy as jnp
        >>> import paddlescience_tpu as psci
        >>> metric = psci.metric.L2Rel()
        >>> r = metric({"u": jnp.full((4, 1), 1.1)}, {"u": jnp.ones((4, 1))})
        >>> round(float(r["u"]), 4)
        0.1
    """

    def __call__(self, output_dict, label_dict):
        return {
            key: jnp.linalg.norm(
                (output_dict[key] - label_dict[key]).reshape(-1)
            )
            / (jnp.linalg.norm(label_dict[key].reshape(-1)) + 1e-12)
            for key in label_dict
        }


class MeanL2Rel(Metric):
    """Per-sample relative L2 averaged over the batch (reference l2_rel.py:80)."""

    def __call__(self, output_dict, label_dict):
        metrics = {}
        for key in label_dict:
            o = output_dict[key].reshape(output_dict[key].shape[0], -1)
            l = label_dict[key].reshape(label_dict[key].shape[0], -1)
            rel = jnp.linalg.norm(o - l, axis=1) / (jnp.linalg.norm(l, axis=1) + 1e-12)
            metrics[key] = rel if self.keep_batch else jnp.mean(rel)
        return metrics


class MAE(Metric):
    def __call__(self, output_dict, label_dict):
        metrics = {}
        for key in label_dict:
            ae = jnp.abs(output_dict[key] - label_dict[key])
            if self.keep_batch:
                metrics[key] = jnp.mean(ae.reshape(ae.shape[0], -1), axis=1)
            else:
                metrics[key] = jnp.mean(ae)
        return metrics


class MSE(Metric):
    def __call__(self, output_dict, label_dict):
        metrics = {}
        for key in label_dict:
            se = (output_dict[key] - label_dict[key]) ** 2
            if self.keep_batch:
                metrics[key] = jnp.mean(se.reshape(se.shape[0], -1), axis=1)
            else:
                metrics[key] = jnp.mean(se)
        return metrics


class RMSE(Metric):
    def __call__(self, output_dict, label_dict):
        return {
            key: jnp.sqrt(jnp.mean((output_dict[key] - label_dict[key]) ** 2))
            for key in label_dict
        }


class MaxAE(Metric):
    def __call__(self, output_dict, label_dict):
        return {key: jnp.max(jnp.abs(output_dict[key] - label_dict[key])) for key in label_dict}


def _lat_weights(num_lat: int) -> jnp.ndarray:
    """cos(lat) weights normalized to mean 1 (FourCastNet convention,
    reference metric/anomaly_coef.py:28)."""
    lat = np.linspace(90, -90, num_lat)
    w = np.cos(np.deg2rad(lat))
    return jnp.asarray(w / np.mean(w))


class LatitudeWeightedACC(Metric):
    """Latitude-weighted anomaly correlation coefficient for weather fields
    (B, C, H=lat, W=lon); optionally subtracts dataset mean first."""

    def __init__(self, num_lat: int, keep_batch: bool = False, mean: Dict[str, np.ndarray] = None, variable_dict=None):
        super().__init__(keep_batch)
        self.num_lat = num_lat
        self.mean = mean
        self.weights = _lat_weights(num_lat)[None, None, :, None]

    def __call__(self, output_dict, label_dict):
        metrics = {}
        for key in label_dict:
            o, l = output_dict[key], label_dict[key]
            if self.mean is not None and key in self.mean:
                o = o - self.mean[key]
                l = l - self.mean[key]
            w = self.weights
            num = jnp.sum(w * o * l, axis=(-1, -2))
            den = jnp.sqrt(jnp.sum(w * o * o, axis=(-1, -2)) * jnp.sum(w * l * l, axis=(-1, -2)))
            acc = num / (den + 1e-12)
            metrics[key] = acc if self.keep_batch else jnp.mean(acc)
        return metrics


class LatitudeWeightedRMSE(Metric):
    def __init__(self, num_lat: int, keep_batch: bool = False, std: Dict[str, np.ndarray] = None, variable_dict=None):
        super().__init__(keep_batch)
        self.weights = _lat_weights(num_lat)[None, None, :, None]
        self.std = std

    def __call__(self, output_dict, label_dict):
        metrics = {}
        for key in label_dict:
            se = (output_dict[key] - label_dict[key]) ** 2
            rmse = jnp.sqrt(jnp.mean(self.weights * se, axis=(-1, -2)))
            if self.std is not None and key in self.std:
                rmse = rmse * self.std[key]
            metrics[key] = rmse if self.keep_batch else jnp.mean(rmse)
        return metrics


class FunctionalMetric(Metric):
    """Wrap a user function (output_dict, label_dict) -> dict (reference func.py:27)."""

    def __init__(self, metric_expr: Callable, keep_batch: bool = False):
        super().__init__(keep_batch)
        self.metric_expr = metric_expr

    def __call__(self, output_dict, label_dict=None):
        return self.metric_expr(output_dict, label_dict)


def build_metric(cfg):
    if isinstance(cfg, (list, tuple)):
        out = {}
        for item in cfg:
            item = copy.deepcopy(dict(item))
            name = item.pop("name")
            cls = globals().get(name)
            if cls is None:
                raise ValueError(f"unknown metric '{name}'")
            out[name] = cls(**item)
        return out
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("name")
    cls = globals().get(name)
    if cls is None:
        raise ValueError(f"unknown metric '{name}'")
    return cls(**cfg)
