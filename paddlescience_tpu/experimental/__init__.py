"""Device-side quadrature & special functions
(reference ``ppsci/experimental/math_module.py``)."""

from paddlescience_tpu.experimental.math_module import (  # noqa: F401
    bessel_i0,
    bessel_i0e,
    bessel_i1,
    bessel_i1e,
    fractional_diff,
    gaussian_integrate,
    montecarlo_integrate,
    trapezoid_integrate,
)

__all__ = [
    "bessel_i0",
    "bessel_i0e",
    "bessel_i1",
    "bessel_i1e",
    "fractional_diff",
    "gaussian_integrate",
    "montecarlo_integrate",
    "trapezoid_integrate",
]
