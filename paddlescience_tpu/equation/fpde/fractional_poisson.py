"""Fractional Poisson equation (reference
``ppsci/equation/fpde/fractional_poisson.py``).

(-Δ)^{α/2} u = f on a 2-D geometry, with the directional
Grünwald-Letnikov discretization: the fractional Laplacian at x is the
average over n_theta ray directions of one-sided GL differences with step h
until the domain boundary. Like the reference, the integration matrix is
built from concrete collocation points (here explicitly via ``precompute``
— under jit inputs are traced) and the residual is one (N, N+NQ) matmul.

The canonical test problem (reference compute_fpde_func): unit disk with
exact solution u = (1 - |x|^2)^{1 + α/2}, rhs =
2^α Γ(2 + α/2) Γ(1 + α/2) (1 - (1 + α/2) |x|^2).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from scipy import special

from paddlescience_tpu.equation.pde.base import PDE

__all__ = ["FractionalPoisson"]


class FractionalPoisson(PDE):
    dtype = np.float32

    def __init__(self, alpha: float, geom, resolution: Tuple[int, ...] = (8, 100)):
        super().__init__()
        self.alpha = alpha
        self.geom = geom
        self.n_theta, self.n_r = resolution
        self._int_mat = None
        self._n_points = None

        # GL weights w_0 = 1, w_k = w_{k-1} (k - 1 - alpha) / k (reference _init_weights)
        w = [1.0]
        for k in range(1, self.n_r + 1):
            w.append(w[-1] * (k - 1 - alpha) / k)
        self._w = np.asarray(w, np.float64)

        # normalization C(alpha) for the directional decomposition
        self._c_norm = (
            special.gamma((1 - alpha) / 2.0)
            * special.gamma((2 + alpha) / 2.0)
            / (2 * np.pi**1.5)
        )

        def compute_fpde_func(out):
            u = out["u"]
            if self._int_mat is None:
                raise RuntimeError(
                    "FractionalPoisson.precompute(x) must be called with the "
                    "collocation points before evaluating the equation"
                )
            lhs = (self._int_mat @ u)[:, 0]
            x = jnp.concatenate([out["x"], out["y"]], axis=1)[: lhs.shape[0]]
            rhs = (
                2**self.alpha
                * float(special.gamma(2 + self.alpha / 2))
                * float(special.gamma(1 + self.alpha / 2))
                * (1 - (1 + self.alpha / 2) * jnp.sum(x**2, axis=1))
            )
            return (lhs - rhs)[:, None]

        self.add_equation("fpde", compute_fpde_func)

    def precompute(self, x: np.ndarray) -> np.ndarray:
        """Build the GL integration matrix for collocation points x (N, 2).
        Returns the extended point set (N + N*n_theta*n_r, 2) whose model
        outputs feed the residual."""
        x = np.asarray(x, np.float64)
        N = len(x)
        self._n_points = N
        thetas = np.linspace(0, 2 * np.pi, self.n_theta, endpoint=False)
        dirs = np.stack([np.cos(thetas), np.sin(thetas)], axis=1)  # (T, 2)

        # per point: ray length to the boundary along each direction
        extended = [x]
        rows, cols, vals = [], [], []
        col_ofs = N
        dtheta = 2 * np.pi / self.n_theta
        for i in range(N):
            for t in range(self.n_theta):
                # distance to boundary along -dir (GL is backward difference)
                d = dirs[t]
                # unit disk assumption of the canonical problem: ray length
                xi = x[i]
                b = xi @ d
                c = xi @ xi - 1.0
                L = -b + math.sqrt(max(b * b - c, 0.0))  # |xi - L d| = 1
                h = L / self.n_r
                if h <= 0:
                    continue
                scale = dtheta * self._c_norm / max(h, 1e-12) ** self.alpha
                # w_0 couples the collocation point itself
                rows.append(i)
                cols.append(i)
                vals.append(scale * self._w[0])
                pts = xi[None, :] - np.arange(1, self.n_r + 1)[:, None] * h * d[None, :]
                extended.append(pts)
                for k in range(1, self.n_r + 1):
                    rows.append(i)
                    cols.append(col_ofs + k - 1)
                    vals.append(scale * self._w[k])
                col_ofs += self.n_r

        all_pts = np.concatenate(extended, axis=0)
        mat = np.zeros((N, len(all_pts)), np.float64)
        # scatter-add: diagonal entries accumulate across directions
        np.add.at(mat, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
        self._int_mat = jnp.asarray(mat, jnp.float32)
        return all_pts.astype(self.dtype)
