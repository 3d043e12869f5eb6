"""Sympy → traced-JAX lowering.

TPU-native counterpart of reference ``ppsci/utils/symbolic.py:681-981``
(``lambdify``). The reference compiles a sympy expression into a
topologically-ordered list of Node objects executed against a string-keyed
cache, with a hand-written derivative-fusion pass. Here the lowering is far
simpler because XLA does the fusion: ``lambdify`` returns a plain Python
closure that recursively evaluates the expression against an ``out`` dict
while an autodiff Tape is active — ``Derivative`` terms become tape lookups
into vmapped-jacfwd derivative stacks (``autodiff/ad.py``), so the entire
residual graph traces into one XLA program and shared sub-derivatives are
CSE'd by the compiler (the reference's FusedDerivativeNode pass becomes a
no-op by construction).

Key naming parity: ``_cvt_to_key`` produces keys like ``u__x__y``
(reference symbolic.py:111-137), used by constraints to name residual
outputs.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import sympy as sp

from paddlescience_tpu.autodiff import ad

__all__ = ["lambdify", "_cvt_to_key", "DETACH_FUNC_NAME"]

DETACH_FUNC_NAME = "detach"


def _cvt_to_key(expr: sp.Basic) -> str:
    """Sympy expression → string key: Derivative(u(x,y),(x,2)) → 'u__x__x'.
    Matches reference symbolic.py:111-137."""
    if isinstance(expr, sp.Function) and str(expr.func) == DETACH_FUNC_NAME:
        return f"{_cvt_to_key(expr.args[0])}_{DETACH_FUNC_NAME}"
    if isinstance(expr, (sp.Symbol, sp.core.function.UndefinedFunction, sp.Function)):
        return expr.name if hasattr(expr, "name") else str(expr)
    if isinstance(expr, sp.Derivative):
        expr_str = expr.args[0].name
        for symbol, order in expr.args[1:]:
            expr_str += f"__{symbol}" * order
        return expr_str
    return str(expr)


def _heaviside(x, h0=0.5):
    return jnp.where(x > 0, 1.0, jnp.where(x < 0, 0.0, h0))


_FUNC_MAP = {
    sp.sin: jnp.sin,
    sp.cos: jnp.cos,
    sp.tan: jnp.tan,
    sp.asin: jnp.arcsin,
    sp.acos: jnp.arccos,
    sp.atan: jnp.arctan,
    sp.atan2: jnp.arctan2,
    sp.sinh: jnp.sinh,
    sp.cosh: jnp.cosh,
    sp.tanh: jnp.tanh,
    sp.asinh: jnp.arcsinh,
    sp.acosh: jnp.arccosh,
    sp.atanh: jnp.arctanh,
    sp.erf: jax.scipy.special.erf,
    sp.loggamma: jax.scipy.special.gammaln,
    sp.exp: jnp.exp,
    sp.log: jnp.log,
    sp.Abs: jnp.abs,
    sp.sign: jnp.sign,
    sp.ceiling: jnp.ceil,
    sp.floor: jnp.floor,
    sp.re: jnp.real,
    sp.im: jnp.imag,
    sp.sqrt: jnp.sqrt,
}


def _eval_pow(base, exponent):
    """Pow with the fast/accurate special cases (integer powers expand into
    multiplies — the reference notes Pow(u,3) degrades L2 vs u*u*u; expanded
    multiplies also keep the op on the VPU without a transcendental)."""
    if isinstance(exponent, (int, float)):
        if exponent == int(exponent) and 0 < int(exponent) <= 4:
            result = base
            for _ in range(int(exponent) - 1):
                result = result * base
            return result
        if exponent == -1:
            return 1.0 / base
        if exponent == 0.5:
            return jnp.sqrt(base)
        if exponent == -0.5:
            return jax.lax.rsqrt(base)
        if exponent == -2:
            inv = 1.0 / base
            return inv * inv
    return base**exponent


class _Lowerer:
    def __init__(self, out: Dict[str, jnp.ndarray]):
        self.out = out
        self.memo: Dict[sp.Basic, jnp.ndarray] = {}

    def eval(self, expr: sp.Basic):
        if expr in self.memo:
            return self.memo[expr]
        val = self._eval(expr)
        self.memo[expr] = val
        return val

    def _lookup(self, key: str):
        if key not in self.out:
            raise KeyError(
                f"'{key}' not available during expression evaluation; present keys: {sorted(self.out)}"
            )
        return self.out[key]

    def _eval(self, expr: sp.Basic):
        out = self.out
        if isinstance(expr, sp.Number):
            return float(expr)
        if isinstance(expr, sp.NumberSymbol):  # pi, E, ...
            return float(expr)
        if expr is sp.I:
            raise ValueError("complex unit not supported in residual expressions")
        if isinstance(expr, sp.Symbol):
            return self._lookup(expr.name)
        # Max/Min/Heaviside are not sp.Function subclasses — handle early
        if expr.func in (sp.Max, sp.Min):
            op = jnp.maximum if expr.func is sp.Max else jnp.minimum
            vals = [ad.unwrap(self.eval(a)) for a in expr.args]
            return functools.reduce(op, vals)
        if expr.func is sp.Heaviside:
            xv = ad.unwrap(self.eval(expr.args[0]))
            h0 = ad.unwrap(self.eval(expr.args[1])) if len(expr.args) > 1 else 0.5
            return _heaviside(xv, h0)
        if isinstance(expr, sp.Derivative):
            val = self.eval(expr.args[0])
            for symbol, order in expr.args[1:]:
                coord = self._lookup(symbol.name)
                for _ in range(int(order)):
                    val = ad.jacobian(val, coord)
            return val
        if isinstance(expr, sp.Piecewise):
            result = None
            for value, cond in reversed(expr.args):
                v = self.eval(value)
                if cond is sp.true or cond == True:  # noqa: E712
                    result = v
                else:
                    c = ad.unwrap(self.eval(cond))
                    result = v if result is None else jnp.where(c, ad.unwrap(v), ad.unwrap(result))
            return result
        if isinstance(expr, sp.Function):
            fname = str(expr.func)
            if fname == DETACH_FUNC_NAME:
                return ad.stop_gradient(self.eval(expr.args[0]))
            if isinstance(expr.func, sp.core.function.UndefinedFunction):
                # model output / named field: u(x, y) -> out["u"]
                return self._lookup(fname)
            if expr.func in _FUNC_MAP:
                fn = _FUNC_MAP[expr.func]
                args = [self.eval(a) for a in expr.args]
                if len(args) == 1 and isinstance(args[0], ad.TapeArray):
                    return args[0]._unary(fn)  # keep differentiable
                return fn(*[ad.unwrap(a) for a in args])
            raise NotImplementedError(f"sympy function {expr.func} not lowered yet")
        if isinstance(expr, sp.Add):
            vals = [self.eval(a) for a in expr.args]
            return functools.reduce(lambda a, b: a + b, vals)
        if isinstance(expr, sp.Mul):
            vals = [self.eval(a) for a in expr.args]
            return functools.reduce(lambda a, b: a * b, vals)
        if isinstance(expr, sp.Pow):
            base = self.eval(expr.args[0])
            exponent = expr.args[1]
            if isinstance(exponent, sp.Number):
                return _eval_pow(base, float(exponent))
            return base ** self.eval(exponent)
        if isinstance(expr, sp.core.relational.Relational):
            lhs, rhs = self.eval(expr.lhs), self.eval(expr.rhs)
            ops = {
                sp.Eq: lambda a, b: a == b,
                sp.Ne: lambda a, b: a != b,
                sp.Lt: lambda a, b: a < b,
                sp.Le: lambda a, b: a <= b,
                sp.Gt: lambda a, b: a > b,
                sp.Ge: lambda a, b: a >= b,
            }
            for cls, op in ops.items():
                if isinstance(expr, cls):
                    return op(lhs, rhs)
        raise NotImplementedError(f"cannot lower sympy node {type(expr)}: {expr}")


def lambdify(
    expr: Union[sp.Basic, Callable, Sequence],
    models=None,
    extra_parameters: Optional[Sequence] = None,
    graph_filename: Optional[str] = None,
    fuse_derivative: bool = True,
    create_graph: bool = True,
    retain_graph: Optional[bool] = None,
) -> Union[Callable, List[Callable]]:
    """Convert sympy expression(s) to callable(s) ``fn(out_dict) -> array``.

    Mirrors reference ``ppsci/utils/symbolic.py:681-981``. ``models`` /
    ``extra_parameters`` are accepted for API parity but not needed: model
    outputs and learnable parameters are looked up in the ``out`` dict the
    expression evaluator provides (``utils/expression.py``), keyed by name.
    ``fuse_derivative``/``create_graph``/``retain_graph`` are no-ops — XLA
    fuses and JAX traces are always differentiable.

    Examples:
        >>> import jax.numpy as jnp
        >>> import sympy as sp
        >>> import paddlescience_tpu as psci
        >>> x = sp.Symbol("x")
        >>> u = sp.Function("u")(x)
        >>> fn = psci.lambdify(2 * u)  # residual fn over the output dict
        >>> float(fn({"u": jnp.array([[3.0]]), "x": jnp.array([[1.0]])})[0, 0])
        6.0
    """
    if isinstance(expr, (list, tuple)):
        return [lambdify(e, models, extra_parameters) for e in expr]
    if callable(expr) and not isinstance(expr, sp.Basic):
        return expr  # python-closure equations pass through

    if not isinstance(expr, sp.Basic):
        raise TypeError(f"expr must be a sympy expression or callable, got {type(expr)}")

    def fn(out: Dict[str, jnp.ndarray], _expr=expr):
        return _Lowerer(out).eval(_expr)

    fn.sympy_expr = expr
    fn.key = _cvt_to_key(expr)
    return fn
