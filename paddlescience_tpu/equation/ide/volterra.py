"""Volterra integral equation (reference ``ppsci/equation/ide/volterra.py``).

u(t) = f(t) + int_a^t K(t,s) u(s) ds — the integral is Gauss-Legendre
quadrature per collocation point. The reference builds the integration
matrix from concrete tensor values inside the forward; under jit the inputs
are traced, so here the matrix is precomputed host-side from the (static)
collocation points via ``precompute(x)`` — call it once after sampling, or
let the constraint input builder do it.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.equation.pde.base import PDE

__all__ = ["Volterra"]


class Volterra(PDE):
    dtype = np.float32

    def __init__(
        self,
        bound: float,
        num_points: int,
        quad_deg: int,
        kernel_func: Callable,
        func: Callable,
    ):
        super().__init__()
        self.bound = bound
        self.num_points = num_points
        self.quad_deg = quad_deg
        self.kernel_func = kernel_func
        self.func = func
        self.quad_x, self.quad_w = np.polynomial.legendre.leggauss(quad_deg)
        self.quad_x = self.quad_x.astype(self.dtype).reshape(-1, 1)
        self.quad_w = self.quad_w.astype(self.dtype)
        self._int_mat = None

        def compute_volterra_func(out):
            u = out["u"]
            lhs = self.func(out)
            if self._int_mat is None:
                raise RuntimeError(
                    "Volterra.precompute(x) must be called with the collocation "
                    "points before evaluating the equation (static quadrature matrix)"
                )
            rhs = self._int_mat @ u  # (N, 1)
            return lhs[: rhs.shape[0]] - rhs

        self.add_equation("volterra", compute_volterra_func)

    # -- quadrature plumbing (reference volterra.py get_quad_points etc.) -------
    def get_quad_points(self, t: np.ndarray) -> np.ndarray:
        """Map Gauss-Legendre nodes from [-1,1] to [a, t] per row: (N, Q)."""
        a, b = self.bound, t
        return ((b - a) / 2) @ self.quad_x.T + (b + a) / 2

    def _get_quad_weights(self, t: float) -> np.ndarray:
        a, b = self.bound, t
        return (b - a) / 2 * self.quad_w

    def _get_int_matrix(self, x: np.ndarray) -> np.ndarray:
        """(N, N + N*Q) matrix: row i integrates K(x_i, s) u(s) over the
        quadrature points appended after the N collocation points."""
        int_mat = np.zeros(
            (self.num_points, self.num_points + self.num_points * self.quad_deg), dtype=self.dtype
        )
        for i in range(self.num_points):
            xi = float(np.ravel(x[i])[0])
            beg = self.num_points + self.quad_deg * i
            end = self.num_points + self.quad_deg * (i + 1)
            K = np.ravel(self.kernel_func(np.full((self.quad_deg, 1), xi), self.get_quad_points(np.array([[xi]])).T))
            int_mat[i, beg:end] = self._get_quad_weights(xi) * K
        return int_mat

    def precompute(self, x: np.ndarray) -> np.ndarray:
        """Build and store the integration matrix for collocation points x
        (the first num_points rows of the constraint input). Returns the
        full input coordinates (collocation + quadrature points) to feed the
        model, shape (N + N*Q, 1)."""
        x = np.asarray(x).reshape(-1, 1)[: self.num_points]
        self._int_mat = jnp.asarray(self._get_int_matrix(x))
        quad_pts = self.get_quad_points(x).reshape(-1, 1)  # (N*Q, 1)
        return np.concatenate([x, quad_pts], axis=0).astype(self.dtype)
