"""PDE zoo (reference ``ppsci/equation``)."""

from typing import Dict

from paddlescience_tpu.equation.pde.base import DETACH_FUNC_NAME, PDE  # noqa: F401
from paddlescience_tpu.equation.fpde.fractional_poisson import FractionalPoisson  # noqa: F401
from paddlescience_tpu.equation.ide.volterra import Volterra  # noqa: F401
from paddlescience_tpu.equation.pde.extra import HeatExchanger, Hooke, NLSMB  # noqa: F401
from paddlescience_tpu.equation.pde.basic import (  # noqa: F401
    AllenCahn,
    Biharmonic,
    Helmholtz,
    Laplace,
    LinearElasticity,
    NavierStokes,
    NormalDotVec,
    Poisson,
    Vibration,
)

__all__ = [
    "PDE",
    "DETACH_FUNC_NAME",
    "AllenCahn",
    "Biharmonic",
    "Helmholtz",
    "Laplace",
    "LinearElasticity",
    "NavierStokes",
    "NormalDotVec",
    "Poisson",
    "Vibration",
    "NLSMB",
    "HeatExchanger",
    "Hooke",
    "Volterra",
    "FractionalPoisson",
    "build_equation",
]


def build_equation(cfg) -> Dict[str, PDE]:
    """Build equations from config dicts (reference equation/__init__.py:55-76).

    cfg: list/dict of {"name": <class>, **kwargs}.
    """
    import copy

    cfg = copy.deepcopy(cfg)
    if isinstance(cfg, dict):
        cfg = [dict(name=k, **v) for k, v in cfg.items()]
    eq_dict = {}
    for item in cfg:
        item = dict(item)
        name = item.pop("name")
        cls = globals().get(name)
        if cls is None or not (isinstance(cls, type) and issubclass(cls, PDE)):
            raise ValueError(f"unknown equation '{name}'")
        eq_dict[name] = cls(**item)
    return eq_dict
