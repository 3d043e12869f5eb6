from paddlescience_tpu.equation.ide.volterra import Volterra  # noqa: F401
