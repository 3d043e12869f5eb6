"""Arch — base class for all networks (dict-keyed I/O).

TPU-native counterpart of reference ``ppsci/arch/base.py:28-279``. Built on
the pure-pytree module system (``psci.nn``) so transforms can be registered
by mutation (reference ergonomics)
while the solver functionalizes the model with ``nn.split`` for jit/grad.

Conventions:
  * every input/output key maps to an array of shape ``(..., k)`` — usually
    ``(N, 1)`` columns; models must accept arbitrary leading batch dims so
    that pointwise derivative stacks (``autodiff.ad``) can vmap over them.
  * ``__call__(self, x: Dict[str, Array]) -> Dict[str, Array]``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.nn.core import Module

__all__ = ["Arch"]


class Arch(Module):
    """Base class for networks with dict-keyed inputs/outputs."""

    input_keys: Tuple[str, ...]
    output_keys: Tuple[str, ...]

    def __init__(self):
        self._input_transform: Optional[Callable] = None
        self._output_transform: Optional[Callable] = None

    def __init_subclass__(cls, **kwargs):
        """Apply registered input/output transforms around ``__call__`` for
        every Arch subclass automatically (reference base.py applies them in
        ``forward``). Classes whose ``__call__`` already references the
        transform attributes are left untouched."""
        super().__init_subclass__(**kwargs)
        call = cls.__dict__.get("__call__")
        if call is None or getattr(call, "_psci_transform_wrapped", False):
            return
        code = getattr(call, "__code__", None)
        if code is not None and (
            "_output_transform" in code.co_names or "_input_transform" in code.co_names
        ):
            return
        import functools

        @functools.wraps(call)
        def wrapped(self, x, *args, **kw):
            t_in = getattr(self, "_input_transform", None)
            if t_in is not None:
                x = t_in(x)
            y = call(self, x, *args, **kw)
            t_out = getattr(self, "_output_transform", None)
            if t_out is not None:
                y = t_out(x, y)
            return y

        wrapped._psci_transform_wrapped = True
        cls.__call__ = wrapped

    # -- dict <-> tensor helpers (reference base.py:79-149) ------------------
    @staticmethod
    def concat_to_tensor(data_dict: Dict[str, jnp.ndarray], keys: Sequence[str], axis: int = -1) -> jnp.ndarray:
        if len(keys) == 1:
            return data_dict[keys[0]]
        return jnp.concatenate([data_dict[key] for key in keys], axis=axis)

    @staticmethod
    def split_to_dict(data_tensor: jnp.ndarray, keys: Sequence[str], axis: int = -1) -> Dict[str, jnp.ndarray]:
        if len(keys) == 1:
            return {keys[0]: data_tensor}
        parts = jnp.split(data_tensor, len(keys), axis=axis)
        return {key: parts[i] for i, key in enumerate(keys)}

    # -- transforms (reference base.py:150-219) ------------------------------
    def register_input_transform(self, transform: Callable[[Dict], Dict]) -> None:
        """transform_in(input_dict) -> new_input_dict, applied before forward."""
        self._input_transform = transform

    def register_output_transform(self, transform: Optional[Callable[[Dict, Dict], Dict]]) -> None:
        """transform_out(input_dict, output_dict) -> new_output_dict (hard
        constraint enforcement etc.), applied after forward."""
        self._output_transform = transform

    def supports_jet(self) -> bool:
        """Whether this arch provides ``forward_jet`` (a fused batched
        Taylor-jet forward, see ``autodiff/jet.py``). MLP-family archs
        override; everything else uses the generic nested-jvp stacks."""
        return False

    # -- info -----------------------------------------------------------------

    def freeze(self):
        """Mark all params non-trainable (reference base.py:220). The solver
        respects this via the `trainable` filter when building the opt state."""
        self._frozen = True

    def unfreeze(self):
        self._frozen = False

    def __str__(self):
        return (
            f"{self.__class__.__name__}(input_keys={getattr(self, 'input_keys', None)}, "
            f"output_keys={getattr(self, 'output_keys', None)}, num_params={self.num_params})"
        )
