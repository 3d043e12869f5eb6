"""TPU kernels (Pallas) and device-side data generators."""

from paddlescience_tpu.ops.lbm import lbm_step_pallas, lbm_step_reference, run_cavity  # noqa: F401
