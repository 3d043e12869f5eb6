"""ModelList — multi-model container (reference ``ppsci/arch/model_list.py``)."""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from paddlescience_tpu.arch import base

__all__ = ["ModelList"]


class ModelList(base.Arch):
    """Wrap several Archs; forward runs each and merges output dicts. The
    Solver treats a ModelList as one parameter tree."""

    def __init__(self, model_list: Sequence[base.Arch]):
        super().__init__()
        self.model_list = list(model_list)
        input_keys, output_keys = [], []
        for m in model_list:
            input_keys.extend(m.input_keys)
            output_keys.extend(m.output_keys)
        self.input_keys = tuple(dict.fromkeys(input_keys))
        self.output_keys = tuple(dict.fromkeys(output_keys))

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        y_all = {}
        for model in self.model_list:
            y = model({k: x[k] for k in model.input_keys})
            y_all.update(y)
        return y_all
