"""Real spherical harmonics transform (SHT).

TPU-native counterpart of the reference's vendored ``paddle_harmonics``
(``ppsci/arch/paddle_harmonics/sht.py`` RealSHT/InverseRealSHT,
``legendre.py``, ``quadrature.py`` — itself a port of torch-harmonics).

Analysis:  a_lm = ∫ f(θ,φ) Ȳ_lm* dΩ  =  FFT over φ then Legendre-weighted
sum over θ (Gauss-Legendre or equiangular/Clenshaw-Curtis quadrature).
Synthesis: inverse contraction + irfft. The θ-contractions are einsums over
(nlat, lmax) — MXU matmuls; associated Legendre tables are precomputed
host-side (numpy, float64) and stored as Buffers.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.nn.core import Buffer, Module

__all__ = ["RealSHT", "InverseRealSHT", "legendre_gauss_weights", "clenshaw_curtiss_weights", "precompute_legpoly"]


def legendre_gauss_weights(n: int, a: float = -1.0, b: float = 1.0):
    """Gauss-Legendre nodes/weights on [a, b] (reference quadrature.py)."""
    xlg, wlg = np.polynomial.legendre.leggauss(n)
    xlg = (b - a) * 0.5 * xlg + (b + a) * 0.5
    wlg = wlg * (b - a) * 0.5
    return xlg, wlg


def clenshaw_curtiss_weights(n: int, a: float = -1.0, b: float = 1.0):
    """Clenshaw-Curtis weights for the equiangular grid (reference quadrature.py)."""
    tj = np.pi * np.arange(n) / (n - 1)
    xcc = np.cos(tj)
    wcc = np.zeros(n)
    for j in range(n):
        s = 0.0
        for k in range(1, (n - 1) // 2 + 1):
            ck = 1.0 if 2 * k == n - 1 else 2.0
            s += ck / (4 * k * k - 1) * np.cos(2 * k * tj[j])
        w = 1.0 - s
        w *= 2.0 / (n - 1)
        if j in (0, n - 1):
            w *= 0.5
        wcc[j] = w
    xcc = (b - a) * 0.5 * xcc + (b + a) * 0.5
    wcc = wcc * (b - a) * 0.5
    return xcc[::-1].copy(), wcc[::-1].copy()


def precompute_legpoly(mmax: int, lmax: int, x: np.ndarray) -> np.ndarray:
    """Orthonormalized associated Legendre P̄_l^m(x) table, shape
    (mmax, lmax, nlat) (reference legendre.py). Stable m-recurrence in f64.
    Normalization: ∫ (P̄_l^m)^2 dx * π-factors = 1 over the sphere with the
    e^{imφ}/sqrt(2π) longitudinal basis.
    """
    nlat = len(x)
    x = np.asarray(x, np.float64)
    sinx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    p = np.zeros((mmax, lmax, nlat), np.float64)

    # seed: P̄_0^0 = sqrt(1/(4π))
    p00 = math.sqrt(1.0 / (4.0 * math.pi))
    for m in range(mmax):
        if m == 0:
            pmm = np.full(nlat, p00)
        else:
            pmm = prev_mm * (-np.sqrt((2 * m + 1) / (2.0 * m))) * sinx
        prev_mm = pmm
        if m < lmax:
            p[m, m] = pmm
        if m + 1 < lmax:
            p[m, m + 1] = np.sqrt(2 * m + 3.0) * x * pmm
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = -np.sqrt(((2.0 * l + 1.0) * (l - 1.0 + m) * (l - 1.0 - m)) / ((2.0 * l - 3.0) * (l * l - m * m)))
            p[m, l] = a * x * p[m, l - 1] + b * p[m, l - 2]
    return p


class RealSHT(Module):
    """Forward real SHT: (..., nlat, nlon) real -> (..., lmax, mmax) complex
    (reference sht.py RealSHT)."""

    def __init__(
        self,
        nlat: int,
        nlon: int,
        lmax: Optional[int] = None,
        mmax: Optional[int] = None,
        grid: str = "lobatto",
        norm: str = "ortho",
        csphase: bool = True,
        *,
        rngs=None,
    ):
        self.nlat, self.nlon = nlat, nlon
        self.grid = grid
        self.norm = norm
        self.lmax = lmax or self.nlat
        self.mmax = mmax or self.nlon // 2 + 1

        if grid in ("legendre-gauss", "lobatto"):
            cost, w = legendre_gauss_weights(nlat)
        elif grid == "equiangular":
            cost, w = clenshaw_curtiss_weights(nlat)
        else:
            raise ValueError(f"unknown grid '{grid}'")

        pct = precompute_legpoly(self.mmax, self.lmax, cost)  # (mmax, lmax, nlat)
        weights = pct * w[None, None, :] * (2 * np.pi / nlon)
        self.weights = Buffer(jnp.asarray(weights, jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # FFT in longitude (real -> half spectrum)
        xf = jnp.fft.rfft(x, axis=-1)[..., : self.mmax]  # (..., nlat, mmax)
        # Legendre-weighted sum over latitude per (l, m)
        # weights: (mmax, lmax, nlat); xf: (..., nlat, mmax)
        out = jnp.einsum("...tm,mlt->...lm", xf, self.weights)
        return out


class InverseRealSHT(Module):
    """Inverse real SHT: (..., lmax, mmax) complex -> (..., nlat, nlon) real
    (reference sht.py InverseRealSHT)."""

    def __init__(
        self,
        nlat: int,
        nlon: int,
        lmax: Optional[int] = None,
        mmax: Optional[int] = None,
        grid: str = "lobatto",
        norm: str = "ortho",
        csphase: bool = True,
        *,
        rngs=None,
    ):
        self.nlat, self.nlon = nlat, nlon
        self.lmax = lmax or self.nlat
        self.mmax = mmax or self.nlon // 2 + 1

        if grid in ("legendre-gauss", "lobatto"):
            cost, _ = legendre_gauss_weights(nlat)
        elif grid == "equiangular":
            cost, _ = clenshaw_curtiss_weights(nlat)
        else:
            raise ValueError(f"unknown grid '{grid}'")

        pct = precompute_legpoly(self.mmax, self.lmax, cost)  # (mmax, lmax, nlat)
        self.pct = Buffer(jnp.asarray(pct, jnp.float32))

    def __call__(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        # coeffs: (..., lmax, mmax)
        xf = jnp.einsum("...lm,mlt->...tm", coeffs, self.pct)  # (..., nlat, mmax)
        nfreq = self.nlon // 2 + 1
        if self.mmax < nfreq:
            pad = [(0, 0)] * (xf.ndim - 1) + [(0, nfreq - self.mmax)]
            xf = jnp.pad(xf, pad)
        return jnp.fft.irfft(xf, n=self.nlon, axis=-1) * self.nlon
