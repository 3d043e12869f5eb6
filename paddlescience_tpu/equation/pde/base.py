"""PDE base class.

TPU-native counterpart of reference ``ppsci/equation/pde/base.py:31-151``:
holds ``equations: Dict[str, sympy.Expr | Callable]``, symbol/function
factories, the detach-rewrite (gradient stopping on named sub-expressions,
lowered to ``jax.lax.stop_gradient``), and learnable parameters for inverse
problems — here a plain ``{name: jnp scalar}`` pytree the Solver optimizes
alongside model params and injects into the expression-evaluation ``out``
dict by name.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Callable, Dict, Optional, Tuple, Union

import jax.numpy as jnp
import sympy as sp

from paddlescience_tpu.utils.symbolic import DETACH_FUNC_NAME, _cvt_to_key

__all__ = ["PDE", "DETACH_FUNC_NAME"]


class PDE:
    """Base class for partial differential equations."""

    def __init__(self):
        super().__init__()
        self.equations: Dict[str, Union[sp.Basic, Callable]] = {}
        # inverse-problem learnable parameters: {name: initial value (jnp scalar)}
        self.learnable_parameters: Dict[str, jnp.ndarray] = {}
        self.detach_keys: Optional[Tuple[str, ...]] = None

    @staticmethod
    def create_symbols(symbol_str: str):
        """'x y z' -> sympy symbols tuple (reference base.py:42-63)."""
        return sp.symbols(symbol_str)

    def create_function(self, name: str, invars: Tuple[sp.Symbol, ...]) -> sp.Function:
        """Named function of independent variables: u(x, y) (reference base.py:66-89)."""
        return sp.Function(name)(*invars)

    def create_parameter(self, name: str, init_value: float) -> sp.Symbol:
        """Register a learnable scalar (inverse problems). Returns the sympy
        symbol to use inside equations; the Solver optimizes the value."""
        self.learnable_parameters[name] = jnp.asarray(init_value, jnp.float32)
        return sp.Symbol(name)

    def add_equation(self, name: str, equation: Union[sp.Basic, Callable]) -> None:
        self.equations[name] = equation

    def _apply_detach(self) -> None:
        """Wrap detach_keys sub-expressions in detach(...) to stop parameter
        gradients through those occurrences (reference base.py:91-151)."""
        if not self.detach_keys:
            return
        from sympy.core.traversal import postorder_traversal

        for name, expr in self.equations.items():
            if not isinstance(expr, sp.Basic):
                continue
            expr_ = deepcopy(expr)
            for item in postorder_traversal(expr):
                if _cvt_to_key(item) in self.detach_keys:
                    expr_ = expr_.replace(item, sp.Function(DETACH_FUNC_NAME)(item))
                    # unwrap double-detach
                    expr_ = expr_.replace(
                        sp.Function(DETACH_FUNC_NAME)(sp.Function(DETACH_FUNC_NAME)(item)),
                        sp.Function(DETACH_FUNC_NAME)(item),
                    )
                    # Derivative must act on the raw function, not detach(fn)
                    for item_ in list(postorder_traversal(expr_)):
                        if isinstance(item_, sp.Derivative) and getattr(item_.args[0], "name", None) == DETACH_FUNC_NAME:
                            expr_ = expr_.replace(
                                item_, sp.Derivative(item_.args[0].args[0], *item_.args[1:])
                            )
            self.equations[name] = expr_

    def parameters(self) -> Dict[str, jnp.ndarray]:
        return dict(self.learnable_parameters)

    def set_state_dict(self, state_dict: Dict[str, jnp.ndarray]) -> None:
        self.learnable_parameters.update(state_dict)

    def state_dict(self) -> Dict[str, jnp.ndarray]:
        return dict(self.learnable_parameters)

    def __str__(self):
        return "\n".join(
            [self.__class__.__name__]
            + [f"    {name}: {eq}" for name, eq in self.equations.items()]
        )
