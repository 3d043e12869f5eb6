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
    "build_constraint",
]


def build_constraint(cfg, equation_dict=None, geom_dict=None):
    """Build constraints from a config (reference
    ``ppsci/constraint/__init__.py:41-90``): ``cfg`` carries a shared
    ``dataloader`` block plus a ``content`` list of ``{ClassName: kwargs}``
    items; an ``output_expr`` given as a string is resolved to that
    equation's ``.equations`` dict and ``geom`` strings resolve through
    ``geom_dict``."""
    import copy as _copy

    from paddlescience_tpu.loss import build_loss

    if cfg is None:
        return None
    cfg = _copy.deepcopy(dict(cfg))
    global_dl = dict(cfg.get("dataloader", {}))
    out = {}
    for item in cfg["content"]:
        cls_name = next(iter(item.keys()))
        c = dict(item[cls_name])
        name = c.get("name", cls_name)
        if isinstance(c.get("output_expr"), str):
            c["output_expr"] = equation_dict[c.pop("output_expr")].equations
        if isinstance(c.get("geom"), str):
            c["geom"] = geom_dict[c.pop("geom")]
        dl = dict(c.pop("dataloader", {}))
        dl.update(global_dl)
        c["dataloader_cfg"] = dl
        if "loss" in c and not callable(c["loss"]):
            c["loss"] = build_loss(c["loss"])
        cls = globals()[cls_name]
        # positional-order kwargs map directly: constraints here take
        # (output_expr, label_dict, geom, dataloader_cfg, loss, ...)
        out[name] = cls(**c)
    return out
