"""Inference predictors (reference ``deploy/python_infer/base.py:34``,
``pinn_predictor.py:29``).

The reference exports a static graph and runs it through Paddle-Inference /
TensorRT / ONNXRuntime engines. On TPU the engine *is* XLA: a Predictor
restores checkpointed params and serves batched jit-compiled forwards —
fp32/bf16 precision switch replaces the fp16/int8 engine modes.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.utils import logger, save_load

__all__ = ["Predictor", "PINNPredictor", "GeneralPredictor"]


class Predictor:
    """Base predictor over a model + checkpoint.

    ``artifact_path`` alternatively loads a serialized StableHLO program
    written by ``Solver.export(input_spec=..., export_path=...)`` — serving
    without the Python model code (the reference's engine-file mode)."""

    def __init__(
        self,
        model=None,
        checkpoint_path: Optional[str] = None,
        precision: str = "fp32",
        device: Optional[str] = None,
        cfg: Optional[dict] = None,
        artifact_path: Optional[str] = None,
    ):
        if cfg is not None:
            infer_cfg = cfg.get("INFER", {})
            precision = infer_cfg.get("precision", precision)
            checkpoint_path = infer_cfg.get("pretrained_model_path", checkpoint_path)
            artifact_path = infer_cfg.get("artifact_path", artifact_path)
        if artifact_path is not None:
            from jax import export as jax_export

            with open(artifact_path, "rb") as f:
                exported = jax_export.deserialize(f.read())
            self.model = None
            self.precision = precision
            self._infer_fn = None
            self._artifact_call = exported.call
            return
        if model is None:
            raise ValueError("pass a model or an artifact_path")
        self._artifact_call = None
        self.model = model
        self.precision = precision
        if checkpoint_path:
            params = save_load.load_pretrain(checkpoint_path, model.param_tree())
            model.load_param_tree(params)
        self._params = model.param_tree()
        self._buffers = model.buffer_tree()
        if precision in ("fp16", "bf16"):
            self._params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), self._params)

        @jax.jit
        def infer_fn(params, inp):
            out = self.model.apply(params, inp, buffers=self._buffers)
            return {k: v.astype(jnp.float32) for k, v in out.items()}

        self._infer_fn = infer_fn

    def predict(self, input_dict: Dict[str, np.ndarray], batch_size: int = 64) -> Dict[str, np.ndarray]:
        num = len(next(iter(input_dict.values())))
        if batch_size is None or batch_size > num:
            batch_size = num
        outs: Dict[str, list] = {}
        for lo in range(0, num, batch_size):
            hi = min(lo + batch_size, num)
            batch = {k: np.asarray(v[lo:hi]) for k, v in input_dict.items()}
            pad = batch_size - (hi - lo)
            if pad:
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)], 0) for k, v in batch.items()}
            cast = jnp.bfloat16 if self.precision in ("fp16", "bf16") else jnp.float32
            if self._artifact_call is not None:
                # StableHLO artifacts are traced at a fixed batch shape
                out = self._artifact_call({k: jnp.asarray(v, jnp.float32) for k, v in batch.items()})
            else:
                out = self._infer_fn(self._params, {k: jnp.asarray(v, cast) for k, v in batch.items()})
            for k, v in out.items():
                arr = np.asarray(v)
                outs.setdefault(k, []).append(arr[: hi - lo] if pad else arr)
        return {k: np.concatenate(v, 0) for k, v in outs.items()}


class PINNPredictor(Predictor):
    """Batched dict-I/O predictor for PINN exports (reference
    pinn_predictor.py:29)."""


GeneralPredictor = Predictor
