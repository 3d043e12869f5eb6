"""Constraints (reference ``ppsci/constraint``)."""

from paddlescience_tpu.constraint.base import Constraint  # noqa: F401
from paddlescience_tpu.constraint.constraints import (  # noqa: F401
    BoundaryConstraint,
    InitialConstraint,
    IntegralConstraint,
    InteriorConstraint,
    PeriodicConstraint,
    SupervisedConstraint,
)

__all__ = [
    "Constraint",
    "InteriorConstraint",
    "BoundaryConstraint",
    "InitialConstraint",
    "PeriodicConstraint",
    "IntegralConstraint",
    "SupervisedConstraint",
]
