"""Loss zoo (reference ``ppsci/loss``)."""

import copy

from paddlescience_tpu.loss import mtl  # noqa: F401
from paddlescience_tpu.loss.base import Loss  # noqa: F401
from paddlescience_tpu.loss.losses import (  # noqa: F401
    CausalMSELoss,
    ChamferLoss,
    FunctionalLoss,
    IntegralLoss,
    KLLoss,
    L1Loss,
    L2Loss,
    L2RelLoss,
    MAELoss,
    MSELoss,
    MSELossWithL2Decay,
    PeriodicL1Loss,
    PeriodicL2Loss,
)

__all__ = [
    "Loss",
    "MSELoss",
    "CausalMSELoss",
    "MSELossWithL2Decay",
    "L1Loss",
    "PeriodicL1Loss",
    "L2Loss",
    "PeriodicL2Loss",
    "L2RelLoss",
    "MAELoss",
    "KLLoss",
    "ChamferLoss",
    "IntegralLoss",
    "FunctionalLoss",
    "mtl",
    "build_loss",
]


def build_loss(cfg):
    """Build loss from config dict {"name": <class>, **kwargs}."""
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("name")
    cls = globals().get(name)
    if cls is None or not (isinstance(cls, type) and issubclass(cls, Loss)):
        raise ValueError(f"unknown loss '{name}'")
    return cls(**cfg)
