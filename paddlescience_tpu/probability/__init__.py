"""Bayesian sampling (reference ``ppsci/probability``)."""

from paddlescience_tpu.probability.hmc import HamiltonianMonteCarlo  # noqa: F401

__all__ = ["HamiltonianMonteCarlo"]
