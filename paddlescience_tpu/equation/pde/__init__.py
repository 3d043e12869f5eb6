from paddlescience_tpu.equation.pde.base import PDE  # noqa: F401
