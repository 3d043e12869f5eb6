"""Training engine (reference ``ppsci/solver``)."""

from paddlescience_tpu.solver.solver import Solver  # noqa: F401

__all__ = ["Solver"]
