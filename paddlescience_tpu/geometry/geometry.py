"""Geometry base class: sampling, SDF, CSG operators.

TPU-native counterpart of reference ``ppsci/geometry/geometry.py:34-690``.
All sampling is host-side numpy (build-time, once per constraint — the jitted
train step sees static shapes; device-side resampling is available through
``data.ContinuousNamedArrayDataset``-style generators instead).

Conventions (identical to the reference):
  * ``sdf_func(x)`` is negative inside; ``sample_interior`` returns the
    flipped (positive-inside) value under key ``"sdf"``.
  * ``sample_interior`` -> {dim_keys..., "sdf"?, "sdf__x"?...};
    ``sample_boundary`` -> {dim_keys..., "normal_x"...}.
"""

from __future__ import annotations

import abc
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from paddlescience_tpu.utils import logger, misc

__all__ = ["Geometry"]

_DTYPE = np.float32


class Geometry(abc.ABC):
    """Base class for geometry."""

    def __init__(self, ndim: int, bbox: Tuple[np.ndarray, np.ndarray], diam: float):
        self.ndim = ndim
        self.bbox = bbox
        self.diam = min(diam, float(np.linalg.norm(bbox[1] - bbox[0])))

    @property
    def dim_keys(self):
        return ("x", "y", "z")[: self.ndim]

    @abc.abstractmethod
    def is_inside(self, x: np.ndarray) -> np.ndarray:
        """Boolean mask of points inside the (open) geometry."""

    @abc.abstractmethod
    def on_boundary(self, x: np.ndarray) -> np.ndarray:
        """Boolean mask of points on the boundary."""

    def boundary_normal(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError(f"{misc.typename(self)}.boundary_normal is not implemented")

    def uniform_points(self, n: int, boundary: bool = True) -> np.ndarray:
        """Equi-spaced interior points; falls back to random."""
        logger.warning(f"{misc.typename(self)}.uniform_points not implemented. Use random_points instead.")
        return self.random_points(n)

    @abc.abstractmethod
    def random_points(self, n: int, random: str = "pseudo") -> np.ndarray:
        """(n, ndim) random points inside the geometry."""

    @abc.abstractmethod
    def random_boundary_points(self, n: int, random: str = "pseudo") -> np.ndarray:
        """(n, ndim) random points on the boundary."""

    def uniform_boundary_points(self, n: int) -> np.ndarray:
        logger.warning(
            f"{misc.typename(self)}.uniform_boundary_points not implemented. Use random_boundary_points instead."
        )
        return self.random_boundary_points(n)

    def periodic_point(self, x: np.ndarray, component: int):
        raise NotImplementedError(f"{misc.typename(self)}.periodic_point to be implemented")

    # -- sampling entry points (reference geometry.py:130-344) ----------------
    def sample_interior(
        self,
        n: int,
        random: str = "pseudo",
        criteria: Optional[Callable[..., np.ndarray]] = None,
        evenly: bool = False,
        compute_sdf_derivatives: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Rejection-sample n interior points meeting `criteria`; returns
        coordinate columns plus positive-inside "sdf" (and "sdf__*" finite-
        difference derivatives if requested)."""
        x = np.empty(shape=(n, self.ndim), dtype=_DTYPE)
        _size, _ntry, _nsuc = 0, 0, 0
        while _size < n:
            if evenly:
                points = self.uniform_points(n)
            else:
                if misc.typename(self) == "TimeXGeometry":
                    points = self.random_points(n, random, criteria)
                else:
                    points = self.random_points(n, random)

            if criteria is not None:
                criteria_mask = criteria(*np.split(points, self.ndim, axis=1)).flatten()
                points = points[criteria_mask]

            if len(points) > n - _size:
                points = points[: n - _size]
            x[_size : _size + len(points)] = points
            _size += len(points)
            _ntry += 1
            if len(points) > 0:
                _nsuc += 1
            if _ntry >= 1000 and _nsuc == 0:
                raise ValueError(
                    "Sample interior points failed, please check correctness of geometry and given criteria."
                )

        x_dict = misc.convert_to_dict(x, self.dim_keys)
        sdf_dict, sdf_derives_dict = {}, {}
        if hasattr(self, "sdf_func"):
            sdf = -self.sdf_func(x)
            sdf_dict = misc.convert_to_dict(sdf.astype(_DTYPE), ("sdf",))
            if compute_sdf_derivatives:
                sdf_derives = -self.sdf_derivatives(x)
                sdf_derives_dict = misc.convert_to_dict(
                    sdf_derives.astype(_DTYPE), tuple(f"sdf__{key}" for key in self.dim_keys)
                )
        return {**x_dict, **sdf_dict, **sdf_derives_dict}

    def sample_boundary(
        self,
        n: int,
        random: str = "pseudo",
        criteria: Optional[Callable[..., np.ndarray]] = None,
        evenly: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Rejection-sample n boundary points; returns coordinates plus
        outward normals (and "area" for mesh-backed geometries)."""
        x = np.empty(shape=(n, self.ndim), dtype=_DTYPE)
        _size, _ntry, _nsuc = 0, 0, 0
        is_mesh_time = misc.typename(self) == "TimeXGeometry" and misc.typename(
            getattr(self, "geometry", None)
        ) in ("Mesh", "SDFMesh")
        normal = area = None
        if is_mesh_time:
            # TimeXGeometry over a mesh returns an exactly-n aligned
            # (points, normals, areas) triple with criteria applied inside
            # (spatial-only criteria, t fixed to None) — no outer rejection
            # loop, which would decouple normals/areas from the points.
            if evenly:
                x, normal, area = self.uniform_boundary_points(n)
            else:
                x, normal, area = self.random_boundary_points(n, random, criteria)
        else:
            while _size < n:
                if evenly:
                    points = self.uniform_boundary_points(n)
                elif misc.typename(self) == "TimeXGeometry":
                    points = self.random_boundary_points(n, random, criteria)
                else:
                    points = self.random_boundary_points(n, random)

                if criteria is not None:
                    criteria_mask = criteria(*np.split(points, self.ndim, axis=1)).flatten()
                    points = points[criteria_mask]

                if len(points) > n - _size:
                    points = points[: n - _size]
                x[_size : _size + len(points)] = points
                _size += len(points)
                _ntry += 1
                if len(points) > 0:
                    _nsuc += 1
                if _ntry >= 10000 and _nsuc == 0:
                    raise ValueError(
                        "Sample boundary points failed, please check correctness of geometry and given criteria."
                    )

        if not is_mesh_time:
            normal = self.boundary_normal(x)

        normal_dict = misc.convert_to_dict(
            (normal[:, 1:] if "t" in self.dim_keys else normal).astype(_DTYPE),
            [f"normal_{key}" for key in self.dim_keys if key != "t"],
        )
        x_dict = misc.convert_to_dict(x, self.dim_keys)
        if is_mesh_time:
            area_dict = misc.convert_to_dict(area[:, 1:].astype(_DTYPE), ["area"])
            return {**x_dict, **normal_dict, **area_dict}
        return {**x_dict, **normal_dict}

    def sdf_derivatives(self, x: np.ndarray, epsilon: float = 1e-4) -> np.ndarray:
        """Central-difference derivatives of sdf_func (reference geometry.py:439)."""
        if not hasattr(self, "sdf_func"):
            raise NotImplementedError(
                f"{misc.typename(self)}.sdf_func should be implemented when using 'sdf_derivatives'."
            )
        sdf_derives = np.empty_like(x)
        for i in range(self.ndim):
            h = np.zeros_like(x)
            h[:, i] += epsilon / 2
            sdf_derives[:, i : i + 1] = (self.sdf_func(x + h) - self.sdf_func(x - h)) / epsilon
        return sdf_derives

    # -- CSG operators (reference geometry.py:488-679) -------------------------
    def union(self, other: "Geometry") -> "Geometry":
        from paddlescience_tpu.geometry import csg

        return csg.CSGUnion(self, other)

    def __or__(self, other: "Geometry") -> "Geometry":
        return self.union(other)

    def difference(self, other: "Geometry") -> "Geometry":
        from paddlescience_tpu.geometry import csg

        return csg.CSGDifference(self, other)

    def __sub__(self, other: "Geometry") -> "Geometry":
        return self.difference(other)

    def intersection(self, other: "Geometry") -> "Geometry":
        from paddlescience_tpu.geometry import csg

        return csg.CSGIntersection(self, other)

    def __and__(self, other: "Geometry") -> "Geometry":
        return self.intersection(other)

    def __str__(self) -> str:
        return ", ".join(
            [
                self.__class__.__name__,
                f"ndim = {self.ndim}",
                f"bbox = {self.bbox}",
                f"diam = {self.diam}",
                f"dim_keys = {self.dim_keys}",
            ]
        )
