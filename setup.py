from setuptools import find_packages, setup

setup(
    name="paddlescience_tpu",
    version="0.1.0",
    description="TPU-native scientific-ML framework (PaddleScience-class) on JAX/XLA/Pallas",
    packages=find_packages(include=["paddlescience_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy", "scipy", "sympy"],
)
