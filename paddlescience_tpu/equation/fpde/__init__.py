from paddlescience_tpu.equation.fpde.fractional_poisson import FractionalPoisson  # noqa: F401
