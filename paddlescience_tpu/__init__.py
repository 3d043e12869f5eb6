"""paddlescience_tpu — a TPU-native scientific-ML framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of
PaddlePaddle/PaddleScience (``ppsci``): PINNs over sympy-defined PDE
residuals with high-order forward-mode autodiff, geometry sampling with CSG,
operator learning (DeepONet/FNO/LNO/...), a constraint/validator/Solver
training engine with data-parallel sharding over TPU meshes, and jit-exported
inference.

Typical use mirrors the reference::

    import paddlescience_tpu as psci
    model = psci.arch.MLP(("x", "y"), ("u",), 5, 128)
    eq = psci.equation.Laplace(dim=2)
    ...
    solver = psci.solver.Solver(model, constraint, optimizer=opt, ...)
    solver.train()
"""

import os as _os

import jax

# PINN residual accuracy on TPU needs f32-class matmuls (TPU MXU natively
# computes bf16 passes). "highest" = 6-pass (full f32), "high" = 3-pass,
# "default" = 1 bf16 pass. Default is "high": validated convergence parity
# on the Allen-Cahn flagship (L2Rel 0.0360 vs 0.0348 at "highest" after
# identical 20k steps) at ~1.7x the training throughput. Override with
# PSCI_MATMUL_PRECISION=default|high|highest.
jax.config.update(
    "jax_default_matmul_precision", _os.environ.get("PSCI_MATMUL_PRECISION", "high")
)

# Persistent compilation cache: tunneled-TPU compiles are slow (~0.4 s per op
# shape); caching amortizes them across runs. XLA-internal AOT blobs are
# excluded ('none') — they embed host-CPU machine features and produce WRONG
# NUMERICS when the sandbox migrates across heterogeneous hosts (observed).
# SURVEY §5.2: deterministic PRNG is native; NaN detection via
# PSCI_DEBUG_NANS=1 (jax_debug_nans re-runs the failing op un-jitted and
# points at the exact primitive)
if _os.environ.get("PSCI_DEBUG_NANS", "0") == "1":
    jax.config.update("jax_debug_nans", True)

# On the CPU backend the cached entry IS a host-specific AOT executable
# ('enable_xla_caches' only governs the GPU side caches), so a persistent
# cache on CPU risks SIGILL/wrong numerics after a host migration — and CPU
# compiles are fast anyway. Enable the cache only when not pinned to CPU.
_cpu_pinned = (
    _os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu"
    or _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    or (getattr(jax.config, "jax_platforms", None) or "").lower() == "cpu"
)
if _os.environ.get("PSCI_DISABLE_COMPILE_CACHE", "0") != "1" and not _cpu_pinned:
    jax.config.update("jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

from paddlescience_tpu import arch  # noqa: E402,F401
from paddlescience_tpu import autodiff  # noqa: E402,F401
from paddlescience_tpu import equation  # noqa: E402,F401
from paddlescience_tpu import utils  # noqa: E402,F401
from paddlescience_tpu.utils.symbolic import lambdify  # noqa: E402,F401

# subpackages with heavier deps import lazily below; keep the core import light
_LAZY_SUBMODULES = (
    "geometry",
    "data",
    "constraint",
    "validate",
    "loss",
    "metric",
    "optimizer",
    "solver",
    "visualize",
    "experimental",
    "probability",
    "ops",
    "parallel",
    "deploy",
)


def __getattr__(name):
    if name in _LAZY_SUBMODULES:
        import importlib

        mod = importlib.import_module(f"paddlescience_tpu.{name}")
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'paddlescience_tpu' has no attribute '{name}'")


__version__ = "0.1.0"
