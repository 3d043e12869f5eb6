"""High-order autodiff (reference ``ppsci/autodiff``)."""

from paddlescience_tpu.autodiff.ad import (  # noqa: F401
    Tape,
    clear,
    current_tape,
    hessian,
    hessian_fn,
    jacobian,
    jacobian_fn,
)

__all__ = ["Tape", "clear", "current_tape", "hessian", "hessian_fn", "jacobian", "jacobian_fn"]
