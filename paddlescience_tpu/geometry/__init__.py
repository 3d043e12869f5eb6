"""Geometry & sampling (reference ``ppsci/geometry``)."""

import copy

from paddlescience_tpu.geometry.csg import CSGDifference, CSGIntersection, CSGUnion  # noqa: F401
from paddlescience_tpu.geometry.geometry import Geometry  # noqa: F401
from paddlescience_tpu.geometry.geometry_1d import Interval  # noqa: F401
from paddlescience_tpu.geometry.geometry_2d import Disk, Polygon, Rectangle, Triangle  # noqa: F401
from paddlescience_tpu.geometry.geometry_3d import Cuboid, Sphere  # noqa: F401
from paddlescience_tpu.geometry.geometry_nd import Hypercube, Hypersphere  # noqa: F401
from paddlescience_tpu.geometry.mesh import Mesh, SDFMesh  # noqa: F401
from paddlescience_tpu.geometry.pointcloud import PointCloud  # noqa: F401
from paddlescience_tpu.geometry.timedomain import TimeDomain, TimeXGeometry  # noqa: F401

__all__ = [
    "Geometry",
    "Interval",
    "Disk",
    "Rectangle",
    "Triangle",
    "Polygon",
    "Cuboid",
    "Sphere",
    "Hypercube",
    "Hypersphere",
    "CSGUnion",
    "CSGDifference",
    "CSGIntersection",
    "PointCloud",
    "Mesh",
    "SDFMesh",
    "TimeDomain",
    "TimeXGeometry",
    "build_geometry",
]


def build_geometry(cfg):
    """Build geometry from config dict(s) (reference geometry/__init__.py)."""
    cfg = copy.deepcopy(cfg)
    if isinstance(cfg, (list, tuple)):
        return {item["name"]: build_geometry(item) for item in cfg}
    cfg = dict(cfg)
    name = cfg.pop("name")
    if name == "TimeXGeometry":
        timedomain = build_geometry(cfg.pop("timedomain"))
        geom = build_geometry(cfg.pop("geometry"))
        return TimeXGeometry(timedomain, geom)
    cls = globals().get(name)
    if cls is None or not (isinstance(cls, type) and issubclass(cls, Geometry)):
        raise ValueError(f"unknown geometry '{name}'")
    return cls(**cfg)
