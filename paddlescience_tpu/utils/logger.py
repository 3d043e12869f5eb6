"""Rank-0 singleton logger with optional scalar writers.

TPU-native counterpart of reference ``ppsci/utils/logger.py:61-234``: a
process-wide logger that writes to stdout + optional file on process 0 only,
plus ``scalar()`` fan-out to TensorBoard (if available) and a JSONL fallback.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import sys
from typing import Dict, Optional

import jax

_logger: Optional[logging.Logger] = None
_log_file: Optional[str] = None
_scalar_writers = []

__all__ = [
    "init_logger",
    "set_log_level",
    "info",
    "message",
    "debug",
    "warning",
    "error",
    "scalar",
    "add_scalar_writer",
    "ensure_logger",
]


def init_logger(
    name: str = "paddlescience_tpu",
    log_file: Optional[str] = None,
    log_level: int = logging.INFO,
) -> logging.Logger:
    global _logger, _log_file
    if isinstance(log_level, str):
        log_level = getattr(logging, log_level.upper())

    logger = logging.getLogger(name)
    logger.propagate = False
    logger.handlers.clear()

    fmt = logging.Formatter("[%(asctime)s] %(name)s %(levelname)s: %(message)s", datefmt="%Y/%m/%d %H:%M:%S")
    if jax.process_index() == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file is not None:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file, "a")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
            _log_file = log_file
        logger.setLevel(log_level)
    else:
        logger.setLevel(logging.ERROR)

    _logger = logger
    return logger


def ensure_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        init_logger()
    return _logger


def set_log_level(log_level) -> None:
    ensure_logger().setLevel(log_level)


def _log(level: str, msg: str):
    getattr(ensure_logger(), level)(msg)


def info(msg: str):
    _log("info", msg)


def message(msg: str):
    # plain message without level decoration (reference parity)
    ensure_logger().info(msg)


def debug(msg: str):
    _log("debug", msg)


def warning(msg: str):
    _log("warning", msg)


def error(msg: str):
    _log("error", msg)


class JSONLScalarWriter:
    """Append scalars to a .jsonl file — zero-dependency observability."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def add_scalar(self, tag: str, value: float, step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def close(self):
        pass


def add_scalar_writer(writer) -> None:
    _scalar_writers.append(writer)


def scalar(metric_dict: Dict[str, float], step: int, *args, **kwargs) -> None:
    """Fan a dict of scalars out to all registered writers (rank-0 only)."""
    if jax.process_index() != 0:
        return
    for writer in _scalar_writers:
        for k, v in metric_dict.items():
            writer.add_scalar(k, float(v), step)
