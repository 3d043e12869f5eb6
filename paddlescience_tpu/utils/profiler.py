"""Profiling hooks (reference NVTX ranges, ``ppsci/solver/solver.py:540``,
``train.py:69-213``; BENCHMARK_ROOT timing).

TPU equivalents: ``jax.profiler`` xplane traces (view in TensorBoard /
xprof) and ``block_until_ready`` wall timing. Enable with env
``PSCI_PROFILE_DIR=/path`` — traces are captured for steps
[PSCI_PROFILE_START, PSCI_PROFILE_STOP) like the reference's 25-step NVTX
capture window.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["maybe_start", "maybe_stop", "trace_context", "device_sync"]

_ACTIVE = False


def maybe_start(step: int) -> None:
    """Start an xplane trace at the configured step (no-op otherwise)."""
    global _ACTIVE
    trace_dir = os.environ.get("PSCI_PROFILE_DIR")
    if not trace_dir or _ACTIVE:
        return
    start = int(os.environ.get("PSCI_PROFILE_START", 10))
    if step == start:
        jax.profiler.start_trace(trace_dir)
        _ACTIVE = True


def maybe_stop(step: int) -> None:
    global _ACTIVE
    if not _ACTIVE:
        return
    stop = int(os.environ.get("PSCI_PROFILE_STOP", 35))
    if step >= stop:
        jax.profiler.stop_trace()
        _ACTIVE = False


class trace_context:
    """Named sub-trace annotation (NVTX-range analog)."""

    def __init__(self, name: str):
        self._ctx = jax.profiler.TraceAnnotation(name)

    def __enter__(self):
        return self._ctx.__enter__()

    def __exit__(self, *a):
        return self._ctx.__exit__(*a)


def device_sync(tree) -> None:
    """block_until_ready over a pytree (BENCHMARK_ROOT-style sync timing)."""
    jax.block_until_ready(tree)
