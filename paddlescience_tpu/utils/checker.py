"""Install self-check (reference ``ppsci/utils/checker.py:34,120``)."""

from __future__ import annotations

import traceback

from paddlescience_tpu.utils import logger

__all__ = ["run_check", "dynamic_import_to_globals"]


def run_check() -> None:
    """Train a tiny Laplace PINN for a few steps and report health —
    TPU-native analog of ppsci.utils.run_check()."""
    import jax
    import numpy as np

    import paddlescience_tpu as psci

    try:
        logger.info(f"devices: {jax.devices()}")
        model = psci.arch.MLP(("x", "y"), ("u",), 2, 8)
        eq = psci.equation.Laplace(dim=2)
        rect = psci.geometry.Rectangle((0.0, 0.0), (1.0, 1.0))
        cst = psci.constraint.InteriorConstraint(
            eq.equations,
            {"laplace": 0},
            rect,
            {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 2, "batch_size": 64},
            psci.loss.MSELoss(),
            name="EQ",
        )
        solver = psci.solver.Solver(
            model,
            {"EQ": cst},
            None,
            psci.optimizer.Adam(1e-3)(model),
            epochs=1,
            iters_per_epoch=2,
            equation={"laplace": eq},
            log_freq=100,
        )
        solver.train()
        logger.info("paddlescience_tpu is installed successfully and a sanity PINN step ran.✨")
    except Exception:
        traceback.print_exc()
        logger.error(
            "Sanity check failed — please verify jax can see your TPU/CPU "
            "devices and report the traceback above."
        )
        raise


def dynamic_import_to_globals(names, alias=None) -> bool:
    """Import module(s) by name into caller globals if available
    (reference checker.py:120)."""
    import importlib

    names = [names] if isinstance(names, str) else list(names)
    alias = alias or {}
    import inspect

    caller_globals = inspect.stack()[1].frame.f_globals
    ok = True
    for name in names:
        try:
            mod = importlib.import_module(name)
            caller_globals[alias.get(name, name)] = mod
        except ImportError:
            logger.warning(f"module '{name}' is not available")
            ok = False
    return ok
