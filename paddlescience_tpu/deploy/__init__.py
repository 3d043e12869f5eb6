"""Deployment/inference (reference ``deploy/python_infer``)."""

from paddlescience_tpu.deploy.python_infer import GeneralPredictor, PINNPredictor, Predictor  # noqa: F401

__all__ = ["Predictor", "PINNPredictor", "GeneralPredictor"]
