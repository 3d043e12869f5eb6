"""Quadrature + fractional calculus + Bessel functions.

TPU-native counterparts of reference ``ppsci/experimental/math_module.py``:
  * gaussian_integrate    (:110) — Gauss-Legendre over [a,b]^dim, on device
  * trapezoid_integrate   (:403)
  * montecarlo_integrate  (:469)
  * fractional_diff       (:336) — Caputo derivative, Gauss-Legendre form
  * bessel_i0/i0e/i1/i1e  (:30-85)

All pure jnp: integrands trace into the caller's jit; nodes/weights are
computed host-side once (numpy.polynomial) and closed over as constants.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_integrate",
    "trapezoid_integrate",
    "montecarlo_integrate",
    "fractional_diff",
    "bessel_i0",
    "bessel_i0e",
    "bessel_i1",
    "bessel_i1e",
]


def gaussian_integrate(
    fn: Callable,
    dim: int,
    N: int,
    integration_domains: Sequence[Sequence[float]],
) -> jnp.ndarray:
    """Gauss-Legendre quadrature of fn over a dim-dimensional box.

    fn maps (n_points, dim) -> (n_points,) [or (n_points, 1)].
    N is the total point budget; per-dim order = ceil(N^(1/dim)).

    Examples:
        >>> from paddlescience_tpu.experimental import gaussian_integrate
        >>> val = gaussian_integrate(
        ...     lambda x: x ** 2, dim=1, N=32, integration_domains=[[0.0, 1.0]])
        >>> round(float(val), 6)  # int_0^1 x^2 dx = 1/3
        0.333333
    """
    if len(integration_domains) != dim:
        raise ValueError("integration_domains must have `dim` entries")
    n_per_dim = int(np.ceil(N ** (1.0 / dim)))
    nodes, weights = np.polynomial.legendre.leggauss(n_per_dim)

    grids, wgrids = [], []
    for (a, b) in integration_domains:
        scale = (b - a) / 2.0
        shift = (b + a) / 2.0
        grids.append(nodes * scale + shift)
        wgrids.append(weights * scale)

    mesh = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([m.ravel() for m in mesh], axis=-1).astype(np.float32)  # (n^dim, dim)
    wmesh = np.meshgrid(*wgrids, indexing="ij")
    w = np.prod(np.stack([m.ravel() for m in wmesh], axis=-1), axis=-1).astype(np.float32)

    vals = fn(jnp.asarray(pts))
    vals = jnp.reshape(vals, (pts.shape[0], -1))
    return jnp.sum(vals * jnp.asarray(w)[:, None], axis=0).squeeze()


def trapezoid_integrate(y: jnp.ndarray, x: jnp.ndarray = None, dx: float = None, axis: int = -1, mode: str = "sum") -> jnp.ndarray:
    """Trapezoidal rule; mode="sum" gives the integral, "cumsum" the running
    integral (reference math_module.py:403)."""
    if mode == "sum":
        if x is not None:
            return jnp.trapezoid(y, x=x, axis=axis)
        return jnp.trapezoid(y, dx=dx if dx is not None else 1.0, axis=axis)
    if mode == "cumsum":
        y = jnp.moveaxis(y, axis, -1)
        if x is not None:
            d = jnp.diff(jnp.moveaxis(x, axis, -1), axis=-1)
        else:
            d = dx if dx is not None else 1.0
        seg = (y[..., 1:] + y[..., :-1]) / 2.0 * d
        out = jnp.cumsum(seg, axis=-1)
        return jnp.moveaxis(out, -1, axis)
    raise ValueError(f"mode should be 'sum' or 'cumsum', got {mode}")


def montecarlo_integrate(
    fn: Callable,
    dim: int,
    N: int = 1000,
    integration_domains: Sequence[Sequence[float]] = None,
    seed: int = 0,
) -> jnp.ndarray:
    """Uniform MC integral of fn over a box (reference math_module.py:469)."""
    if integration_domains is None or len(integration_domains) != dim:
        raise ValueError("integration_domains must have `dim` entries")
    key = jax.random.PRNGKey(seed)
    lo = jnp.asarray([d[0] for d in integration_domains], jnp.float32)
    hi = jnp.asarray([d[1] for d in integration_domains], jnp.float32)
    pts = jax.random.uniform(key, (N, dim), minval=lo, maxval=hi)
    volume = jnp.prod(hi - lo)
    vals = jnp.reshape(fn(pts), (N, -1))
    return (volume * jnp.mean(vals, axis=0)).squeeze()


def fractional_diff(
    func: Callable,
    alpha: float,
    a: float,
    t: jnp.ndarray,
    h: float = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Caputo fractional derivative of order alpha in (0,1):
    D^a f(t) = 1/Gamma(1-a) * int_a^t f'(s) / (t-s)^a ds
    computed with Gauss-Legendre in s and central differences for f'
    (reference math_module.py:336)."""
    if not (0 < alpha < 1):
        raise ValueError(f"alpha should be in (0, 1), got {alpha}")
    from jax.scipy.special import gammaln

    n_quad = 64
    nodes, weights = np.polynomial.legendre.leggauss(n_quad)
    nodes = jnp.asarray(nodes, dtype)
    weights = jnp.asarray(weights, dtype)
    hh = h if h is not None else 1e-3

    def df(s):
        return (func(s + hh) - func(s - hh)) / (2 * hh)

    def single(ti):
        scale = (ti - a) / 2.0
        shift = (ti + a) / 2.0
        s = nodes * scale + shift
        integrand = df(s) / jnp.maximum(ti - s, 1e-12) ** alpha
        return scale * jnp.sum(weights * integrand) / jnp.exp(gammaln(1 - alpha))

    return jax.vmap(single)(jnp.atleast_1d(t))


# -- modified Bessel functions (reference math_module.py:30-85) -------------------
def bessel_i0(x: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.special.i0(x)


def bessel_i0e(x: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.special.i0e(x)


def bessel_i1(x: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.special.i1(x)


def bessel_i1e(x: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.special.i1e(x)
