"""Config system: YAML + ${...} interpolation + CLI dot-overrides + pydantic
validation.

TPU-native counterpart of the reference's hydra/omegaconf/pydantic stack
(``ppsci/utils/config.py:37-343``, ``utils/callbacks.py:32-110``,
``ppsci/__init__.py:64-78`` custom resolvers). Hydra isn't available in this
environment, so this module implements the subset the reference relies on:

  * YAML loading into an attribute-accessible ``Config`` (DictConfig-like)
  * ``${a.b.c}`` interpolation + the reference's custom resolvers
    ``${numpy:pi}`` and ``${sum:[...]}``
  * command-line overrides ``key.subkey=value`` (hydra syntax)
  * pydantic ``SolverConfig`` validation of the standard fields
  * ``psci.utils.config.main(path)`` decorator — the ``@hydra.main`` analog
    (seeds, logger and output_dir setup = reference InitCallback.on_job_start)
"""

from __future__ import annotations

import ast
import datetime
import functools
import os
import re
import sys
from typing import Any, Dict, List, Literal, Optional

import numpy as np
import yaml

__all__ = [
    "Config",
    "load_config",
    "apply_overrides",
    "main",
    "dispatch",
    "SolverConfig",
    "validate_config",
]


def dispatch(cfg, train=None, evaluate=None, export=None, inference=None):
    """``mode={train,eval,export,infer}`` dispatch — the body every reference
    example repeats under ``@hydra.main`` (e.g.
    ``examples/allen_cahn/allen_cahn_default.py:276-288``)."""
    mode = cfg.get("mode", "train")
    fns = {"train": train, "eval": evaluate, "export": export, "infer": inference}
    if mode not in fns:
        raise ValueError(
            f"cfg.mode should in ['train', 'eval', 'export', 'infer'], but got '{mode}'"
        )
    if fns[mode] is None:
        raise NotImplementedError(f"mode '{mode}' is not implemented for this example")
    return fns[mode](cfg)


class Config(dict):
    """dict with attribute access, recursive."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def get_path(self, dotted: str, default=None):
        node = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            node = node.setdefault(part, Config())
        node[parts[-1]] = value


_INTERP = re.compile(r"\$\{([^}]+)\}")


def _resolve_value(expr: str, root: Config):
    expr = expr.strip()
    if expr.startswith("numpy:"):
        return float(getattr(np, expr.split(":", 1)[1]))
    if expr.startswith("sum:"):
        items = ast.literal_eval(expr.split(":", 1)[1])
        return sum(_resolve(v, root) if isinstance(v, str) else v for v in items)
    if expr.startswith("now:"):
        return datetime.datetime.now().strftime(expr.split(":", 1)[1])
    val = root.get_path(expr, KeyError)
    if val is KeyError:
        raise KeyError(f"config interpolation '${{{expr}}}' not found")
    return _resolve(val, root)


def _resolve(value, root: Config):
    if isinstance(value, str):
        full = _INTERP.fullmatch(value)
        if full:
            return _resolve_value(full.group(1), root)
        return _INTERP.sub(lambda m: str(_resolve_value(m.group(1), root)), value)
    if isinstance(value, dict):
        return Config({k: _resolve(v, root) for k, v in value.items()})
    if isinstance(value, list):
        return [_resolve(v, root) for v in value]
    return value


def load_config(path: str, overrides: Optional[List[str]] = None) -> Config:
    with open(path) as f:
        raw = Config.wrap(yaml.safe_load(f) or {})
    raw.pop("hydra", None)  # reference configs carry a hydra block; ignored here
    if overrides:
        raw = apply_overrides(raw, overrides)
    return _resolve(raw, raw)


def _parse_literal(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        low = s.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("null", "none"):
            return None
        return s


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override '{ov}' must be key.path=value")
        key, val = ov.split("=", 1)
        cfg.set_path(key.strip().lstrip("+"), _parse_literal(val.strip()))
    return cfg


# -- pydantic validation (reference config.py:37-343) ----------------------------
try:
    from pydantic import BaseModel, field_validator

    class TrainConfig(BaseModel):
        epochs: int = 1
        iters_per_epoch: int = 20
        update_freq: int = 1
        save_freq: int = 0
        eval_during_train: bool = False
        start_eval_epoch: int = 1
        eval_freq: int = 1
        batch_size: Optional[Any] = None
        pretrained_model_path: Optional[str] = None
        checkpoint_path: Optional[str] = None

        model_config = {"extra": "allow"}

        @field_validator("epochs")
        @classmethod
        def _epochs_pos(cls, v):
            if v <= 0 and v != -1:
                raise ValueError(f"'epochs' should be a positive integer or -1, got {v}")
            return v

        @field_validator("iters_per_epoch")
        @classmethod
        def _iters_pos(cls, v):
            if v <= 0 and v != -1:
                raise ValueError(f"'iters_per_epoch' should be a positive integer or -1, got {v}")
            return v

    class EvalConfig(BaseModel):
        pretrained_model_path: Optional[str] = None
        eval_with_no_grad: bool = True
        compute_metric_by_batch: bool = False
        batch_size: Optional[Any] = None

        model_config = {"extra": "allow"}

    class SolverConfig(BaseModel):
        mode: Literal["train", "eval", "export", "infer"] = "train"
        seed: int = 42
        output_dir: Optional[str] = None
        log_freq: int = 20
        TRAIN: Optional[TrainConfig] = None
        EVAL: Optional[EvalConfig] = None

        model_config = {"extra": "allow"}

        @field_validator("seed")
        @classmethod
        def _seed_nonneg(cls, v):
            if v < 0:
                raise ValueError(f"'seed' should be non-negative, got {v}")
            return v

    def validate_config(cfg: Config) -> Config:
        """Validate the standard solver fields (reference InitCallback)."""
        SolverConfig.model_validate(dict(cfg))
        return cfg

except ImportError:  # pragma: no cover

    def validate_config(cfg: Config) -> Config:
        return cfg


def main(config_path: str, config_name: Optional[str] = None):
    """``@hydra.main`` analog: loads YAML, applies CLI overrides, validates,
    seeds, sets up logging/output_dir, then calls fn(cfg).

    Example::

        @psci.utils.config.main("./conf/allen_cahn.yaml")
        def run(cfg):
            ...
    """

    def deco(fn):
        # resolve a relative config path against the decorated function's
        # file (hydra semantics: config_path is relative to the script)
        caller_dir = os.path.dirname(os.path.abspath(fn.__code__.co_filename))

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            path = config_path if config_name is None else os.path.join(config_path, config_name)
            if not os.path.isabs(path) and not os.path.exists(path):
                path = os.path.join(caller_dir, path)
            cfg = load_config(path, overrides=sys.argv[1:])
            cfg = validate_config(cfg)
            if not cfg.get("output_dir"):
                stamp = datetime.datetime.now().strftime("%Y-%m-%d/%H-%M-%S")
                name = os.path.splitext(os.path.basename(path))[0]
                cfg["output_dir"] = os.path.join(f"outputs_{name}", stamp)
            from paddlescience_tpu.utils import logger, misc

            misc.set_random_seed(cfg.get("seed", 42))
            os.makedirs(cfg["output_dir"], exist_ok=True)
            logger.init_logger(log_file=os.path.join(cfg["output_dir"], f"{cfg.get('mode', 'train')}.log"))
            return fn(cfg)

        return wrapper

    return deco
