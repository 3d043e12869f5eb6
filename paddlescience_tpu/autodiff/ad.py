"""High-order autodiff with the reference's array-level API, TPU-native core.

The reference (``ppsci/autodiff/ad.py:30-341``) implements ``jacobian(ys, xs)``
/ ``hessian(ys, xs)`` as globally-cached reverse-mode ``paddle.grad`` calls on
graph tensors. On TPU the idiomatic (and much faster) formulation is
*functional*: every model output is a pure function of the collocation
coordinates, and k-th order derivatives are vmapped nested ``jax.jacfwd``
"derivative stacks" — forward-mode is the right shape for PINNs, where input
dimension (2-4) is far smaller than parameter count, and nesting is
transpose-free so XLA fuses the whole residual into one program.

To keep the reference's ergonomic array-level API (equations written as
``jacobian(out["u"], out["x"])`` on actual arrays), a per-trace **Tape**
records, for every array it produces, which derivative-stack element it is.
``jacobian``/``hessian`` then look the array up and return the requested
(cached) stack slice. Everything happens inside one jit trace: the cache is a
Python dict of traced values, so XLA sees a single static graph and CSEs any
shared work.

API parity:
  * ``jacobian(ys, xs, i=0, j=None)``  — reference ad.py:95-160 (incl. the
    batched multi-input form ``jacobian(u, [t, x])``).
  * ``hessian(ys, xs, component=None, i=0, j=0)`` — reference ad.py:239-303.
  * ``clear()`` — reference ad.py:326-341 (drops cached stacks).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "Tape",
    "TapeArray",
    "current_tape",
    "jacobian",
    "hessian",
    "clear",
    "jacobian_fn",
    "hessian_fn",
    "unwrap",
    "stop_gradient",
    "wrap_tape_outputs",
]


class _DerivStack:
    """Lazy derivative stacks of one pointwise function over a point batch.

    ``fn``: (d,) -> (m,) pure function of the coordinates (closing over
    params); ``x``: (N, d). ``get(k)`` returns the vmapped k-th order
    derivative tensor of shape (N, m, d, ..., d) with k trailing d-axes.
    """

    def __init__(
        self,
        fn: Callable,
        x: jnp.ndarray,
        key_index: Dict[str, int],
        out_index: Dict[str, int],
        extras=None,
        jet_fn: Optional[Callable] = None,
        out_width: Optional[int] = None,
    ):
        self.fn = fn  # fn(xvec, extras) -> (m,)
        self.x = x
        self.key_index = key_index  # coordinate key -> input column
        self.out_index = out_index  # output key -> output column
        self.extras = extras if extras is not None else {}
        self.jet_fn = jet_fn  # jet_fn(x, dmultis) -> {dmulti: (N, m)} or None
        self.requested: Dict[Tuple[int, ...], None] = {}  # ordered set
        self.collect_only = False  # abstract replay: record, skip jvp tracing
        if out_width is None:
            out_width = max(out_index.values()) + 1 if out_index else 1
        self.out_width = out_width
        self._orders: Dict[int, jnp.ndarray] = {}
        self._components: Dict[Tuple[int, ...], jnp.ndarray] = {}

    def get(self, order: int) -> jnp.ndarray:
        """Full k-th order derivative tensor (N, m, d^k) via nested jacfwd.
        Kept for full-tensor consumers; the hot path uses get_component."""
        if order not in self._orders:
            fn = self.fn

            def kth(xvec, extras):
                g = lambda v: fn(v, extras)
                for _ in range(order):
                    g = jax.jacfwd(g)
                return g(xvec)

            self._orders[order] = jax.vmap(kth)(self.x, self.extras)
        return self._orders[order]

    def get_component(self, dmulti: Tuple[int, ...]) -> jnp.ndarray:
        """Directional derivative d^k f / dx_{i1}..dx_{ik} as (N, m), via
        nested jvp along basis vectors — cost independent of input dim d
        (a full hessian stack pays d^2 tangents; a PINN residual usually
        needs only a few components). Mixed partials commute, so the
        multi-index is sorted for cache hits; XLA CSEs shared primal chains
        across components.
        """
        dmulti = tuple(sorted(dmulti))
        self.requested[dmulti] = None
        if self.collect_only:
            # request-collection replay (under eval_shape): the value is
            # never used for real — return a shape/dtype stand-in instead of
            # tracing the whole nested-jvp chain (halves trace time)
            return jnp.zeros(self.x.shape[:-1] + (self.out_width,), self.x.dtype)
        if dmulti not in self._components:
            fn = self.fn
            d = self.x.shape[-1]

            def kth(xvec, extras):
                g = lambda v: fn(v, extras)
                for j in dmulti:
                    tangent = jnp.zeros((d,)).at[j].set(1.0)
                    g = (lambda g_, t_: lambda v: jax.jvp(g_, (v,), (t_,))[1])(g, tangent)
                return g(xvec)

            self._components[dmulti] = jax.vmap(kth)(self.x, self.extras)
        return self._components[dmulti]

    def precompute(self, dmultis) -> None:
        """Fill the component cache for all order<=2 requests in one fused
        Taylor-jet forward (``autodiff/jet.py``) — one matmul per layer for
        the whole derivative stack instead of one tangent chain per component.
        Higher-order requests (or stacks without a jet_fn) keep the nested-jvp
        path."""
        if self.jet_fn is None:
            return
        eligible = [m for m in dmultis if 0 < len(m) <= 2 and m not in self._components]
        if not eligible:
            return
        self._components.update(self.jet_fn(self.x, eligible))

    def clear(self):
        self._orders.clear()
        self._components.clear()


class _GridStack:
    """Derivative stacks for separable/product-grid models (SPINN-style):
    output u[i,j,k,:] depends only on coords x[i], y[j], z[k], so the
    derivative along one axis equals a jvp with an all-ones tangent on that
    coordinate vector (cross terms vanish by separability). Cost: one nested
    jvp per component — the SPINN O(N·d) property is preserved.
    """

    def __init__(self, fn: Callable, coords: Dict[str, jnp.ndarray], key_index: Dict[str, int], out_index: Dict[str, int]):
        self.fn = fn  # fn(*coord_arrays) -> (..., m)
        self.coord_keys = list(coords.keys())
        self.coords = [coords[k] for k in self.coord_keys]
        self.key_index = key_index
        self.out_index = out_index
        self._components: Dict[Tuple[int, ...], jnp.ndarray] = {}

    def get_component(self, dmulti: Tuple[int, ...]) -> jnp.ndarray:
        dmulti = tuple(sorted(dmulti))
        if dmulti not in self._components:
            fn = self.fn
            g = lambda *cs: fn(*cs)
            for j in dmulti:
                def wrap(g_, j_):
                    def h(*cs):
                        tangents = tuple(
                            jnp.ones_like(c) if idx == j_ else jnp.zeros_like(c)
                            for idx, c in enumerate(cs)
                        )
                        return jax.jvp(g_, cs, tangents)[1]

                    return h

                g = wrap(g, j)
            self._components[dmulti] = g(*self.coords)
        return self._components[dmulti]

    def clear(self):
        self._components.clear()


class _Record:
    """Provenance of one array: which stack, output column, and which
    coordinate axes it has already been differentiated along."""

    __slots__ = ("stack", "out_col", "dmulti")

    def __init__(self, stack: _DerivStack, out_col: int, dmulti: Tuple[int, ...]):
        self.stack = stack
        self.out_col = out_col
        self.dmulti = dmulti


class Tape:
    """Per-trace registry mapping arrays -> derivative-stack coordinates."""

    def __init__(self):
        self._records: Dict[int, Tuple[jnp.ndarray, _Record]] = {}
        self._coords: Dict[int, Tuple[jnp.ndarray, str]] = {}
        self._stacks: List[_DerivStack] = []
        self.collecting = False  # abstract request-collection replay

    # -- registration ---------------------------------------------------------
    def register_coord(self, name: str, arr: jnp.ndarray) -> None:
        self._coords[id(arr)] = (arr, name)

    def add_stack(
        self,
        fn: Callable,
        x: jnp.ndarray,
        key_index: Dict[str, int],
        out_index: Dict[str, int],
        extras=None,
        jet_fn: Optional[Callable] = None,
        out_width: Optional[int] = None,
    ) -> _DerivStack:
        stack = _DerivStack(fn, x, key_index, out_index, extras=extras,
                            jet_fn=jet_fn, out_width=out_width)
        stack.collect_only = self.collecting
        self._stacks.append(stack)
        return stack

    def register_output(self, arr: jnp.ndarray, stack: _DerivStack, out_col: int, dmulti: Tuple[int, ...] = ()) -> None:
        self._records[id(arr)] = (arr, _Record(stack, out_col, dmulti))

    # -- lookup ----------------------------------------------------------------
    def lookup(self, arr) -> Optional[_Record]:
        hit = self._records.get(id(arr))
        return hit[1] if hit is not None else None

    def coord_name(self, arr) -> Optional[str]:
        hit = self._coords.get(id(arr))
        return hit[1] if hit is not None else None

    def clear(self):
        for stack in self._stacks:
            stack.clear()
        self._records.clear()

    def add_grid_stack(self, fn: Callable, coords: Dict[str, jnp.ndarray], key_index: Dict[str, int], out_index: Dict[str, int]) -> "_GridStack":
        stack = _GridStack(fn, coords, key_index, out_index)
        self._stacks.append(stack)
        return stack

    # -- derivative extraction --------------------------------------------------
    def derivative(self, rec: _Record, j: int) -> jnp.ndarray:
        dmulti = rec.dmulti + (j,)
        comp = rec.stack.get_component(dmulti)  # (..., m)
        out = comp[..., rec.out_col][..., None]
        self.register_output(out, rec.stack, rec.out_col, dmulti)
        return out


class TapeArray:
    """A batched array paired with its pointwise function — the bridge that
    lets ``jacobian``/``hessian`` differentiate *composed* expressions like
    ``jacobian(rho * u, x)`` (reference ad.py does this for free because
    paddle.grad walks the dynamic graph; a jit trace has no such graph, so we
    carry the per-point function alongside the value).

    ``value``: (N, w) batched array — what the expression ultimately uses.
    ``pf(xvec, extras) -> (w,)``: the same quantity at one collocation point.
    Arithmetic on TapeArrays composes both; ``jacobian`` applies a nested
    ``jax.jvp`` to ``pf`` and vmaps it over the stack's point batch (XLA CSE
    merges the shared primal chains, so composition costs no extra forward
    passes at runtime).

    Mixing with batched arrays or across stacks degrades to a plain array
    (values stay correct; a later ``jacobian`` on the result raises the
    standard "not on the autodiff tape" error instead of being silently
    wrong). jnp.* ufuncs on a TapeArray raise outright in this jax version
    (``__jax_array__`` unsupported) — use the tracked methods (``.sin()``,
    ``abs()``, ...) or ``ad.unwrap`` explicitly.
    """

    __slots__ = ("value", "pf", "stack")

    def __init__(self, value, pf, stack):
        self.value = value
        self.pf = pf
        self.stack = stack

    # -- degrading interop -------------------------------------------------------
    def __jax_array__(self):
        return self.value

    def __array__(self, dtype=None):
        import numpy as _np

        return _np.asarray(self.value, dtype=dtype)

    @property
    def shape(self):
        return self.value.shape

    @property
    def ndim(self):
        return self.value.ndim

    @property
    def dtype(self):
        return self.value.dtype

    def __getitem__(self, idx):
        return self.value[idx]

    def __repr__(self):
        return f"TapeArray({self.value!r})"

    # -- tracked arithmetic --------------------------------------------------------
    def _binop(self, other, op, reflected=False):
        apply = (lambda a, b: op(b, a)) if reflected else op
        if isinstance(other, TapeArray):
            if other.stack is not self.stack:
                return apply(self.value, other.value)  # cross-stack: degrade
            f, g = self.pf, other.pf
            return TapeArray(
                apply(self.value, other.value),
                lambda xv, ex: apply(f(xv, ex), g(xv, ex)),
                self.stack,
            )
        is_scalar = isinstance(other, (int, float)) or getattr(other, "ndim", None) == 0
        if is_scalar:
            f = self.pf
            return TapeArray(
                apply(self.value, other), lambda xv, ex: apply(f(xv, ex), other), self.stack
            )
        return apply(self.value, other)  # batched-array operand: degrade

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: a + b, reflected=True)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: a - b, reflected=True)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: a * b, reflected=True)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: a / b, reflected=True)

    def __pow__(self, e):
        if isinstance(e, (int, float)):
            f = self.pf
            return TapeArray(self.value**e, lambda xv, ex: f(xv, ex) ** e, self.stack)
        return self.value ** (e.value if isinstance(e, TapeArray) else e)

    def __neg__(self):
        f = self.pf
        return TapeArray(-self.value, lambda xv, ex: -f(xv, ex), self.stack)

    def __abs__(self):
        f = self.pf
        return TapeArray(jnp.abs(self.value), lambda xv, ex: jnp.abs(f(xv, ex)), self.stack)

    def _unary(self, fn):
        f = self.pf
        return TapeArray(fn(self.value), lambda xv, ex: fn(f(xv, ex)), self.stack)

    def tanh(self):
        return self._unary(jnp.tanh)

    def exp(self):
        return self._unary(jnp.exp)

    def sin(self):
        return self._unary(jnp.sin)

    def cos(self):
        return self._unary(jnp.cos)

    def sqrt(self):
        return self._unary(jnp.sqrt)

    # comparisons degrade to plain boolean arrays
    def __lt__(self, o):
        return self.value < unwrap(o)

    def __le__(self, o):
        return self.value <= unwrap(o)

    def __gt__(self, o):
        return self.value > unwrap(o)

    def __ge__(self, o):
        return self.value >= unwrap(o)


def unwrap(v):
    """TapeArray -> its batched value; anything else passes through."""
    return v.value if isinstance(v, TapeArray) else v


def stop_gradient(v):
    """detach that preserves composability (symbolic DETACH lowering)."""
    if isinstance(v, TapeArray):
        f = v.pf
        return TapeArray(
            jax.lax.stop_gradient(v.value),
            lambda xv, ex: jax.lax.stop_gradient(f(xv, ex)),
            v.stack,
        )
    return jax.lax.stop_gradient(v)


def wrap_tape_outputs(tape: "Tape", out: Dict[str, jnp.ndarray]) -> Dict[str, object]:
    """Build the TapeArray view of an ``out`` dict produced by
    ``forward_with_derivatives``: model outputs (dense stacks) and — when the
    constraint has a single stack — the coordinate columns. Grid-stack (SPINN)
    outputs and extras stay plain arrays (their derivative path is the
    registered-array one)."""
    dense_stacks = [s for s in tape._stacks if isinstance(s, _DerivStack)]
    single = dense_stacks[0] if len(dense_stacks) == 1 else None
    wrapped: Dict[str, object] = {}
    for k, v in out.items():
        rec = tape.lookup(v)
        if rec is not None and isinstance(rec.stack, _DerivStack) and rec.dmulti == ():
            stack, col = rec.stack, rec.out_col
            w = int(v.shape[-1]) if v.ndim >= 1 else 1

            def pf(xvec, extras, _s=stack, _c=col, _w=w):
                return _s.fn(xvec, extras)[_c : _c + _w]

            wrapped[k] = TapeArray(v, pf, stack)
            continue
        name = tape.coord_name(v)
        if name is not None and single is not None and name in single.key_index:
            i = single.key_index[name]

            def cpf(xvec, extras, _i=i):
                return xvec[_i : _i + 1]

            wrapped[k] = TapeArray(v, cpf, single)
            continue
        wrapped[k] = v
    return wrapped


import contextvars

_CURRENT_TAPE: contextvars.ContextVar[Optional[Tape]] = contextvars.ContextVar("psci_tape", default=None)


def current_tape() -> Optional[Tape]:
    return _CURRENT_TAPE.get()


@contextlib.contextmanager
def tape_context(tape: Optional[Tape] = None):
    tape = tape if tape is not None else Tape()
    token = _CURRENT_TAPE.set(tape)
    try:
        yield tape
    finally:
        _CURRENT_TAPE.reset(token)


def _require_tape() -> Tape:
    tape = current_tape()
    if tape is None:
        raise RuntimeError(
            "No active autodiff tape. `jacobian`/`hessian` on arrays only work "
            "inside constraint/equation evaluation (the expression evaluator "
            "opens a tape). For standalone use, see `jacobian_fn`/`hessian_fn`."
        )
    return tape


def _record_pf(stack: _DerivStack, out_col: int, dmulti: Tuple[int, ...]):
    """Pointwise function of a registered derivative component — only traced
    when a *composed* expression built from it is differentiated further
    (the component's value itself comes from the cached stack)."""
    d = stack.x.shape[-1]

    def pf(xvec, extras, _fn=stack.fn, _dm=tuple(dmulti), _c=out_col, _d=d):
        g = lambda v: _fn(v, extras)
        for jj in _dm:
            tangent = jnp.zeros((_d,)).at[jj].set(1.0)
            g = (lambda g_, t_: lambda v: jax.jvp(g_, (v,), (t_,))[1])(g, tangent)
        return g(xvec)[_c : _c + 1]

    return pf


def _resolve_input_col(tape: Tape, rec: _Record, xs: jnp.ndarray, j: Optional[int]) -> int:
    """Map an `xs` array (a registered coordinate column) + optional column
    index j to the stack's input-axis index."""
    name = tape.coord_name(xs)
    if name is not None:
        if name not in rec.stack.key_index:
            raise ValueError(f"coordinate '{name}' is not an input of the differentiated model")
        return rec.stack.key_index[name]
    # xs may be the full concatenated coordinate tensor: then j selects column
    if j is not None:
        return int(j)
    raise ValueError(
        "xs is not a registered input coordinate of the current tape; "
        "pass one of the arrays from the constraint input dict"
    )


def jacobian(
    ys: jnp.ndarray,
    xs: Union[jnp.ndarray, Sequence[jnp.ndarray]],
    i: int = 0,
    j: Optional[int] = None,
) -> Union[jnp.ndarray, List[jnp.ndarray]]:
    """d(ys)/d(xs) on tape-registered arrays (reference ad.py:95-160).

    ``xs`` may be a list of coordinate columns, in which case a list of
    derivatives is returned — the analog of the reference's batched
    one-`paddle.grad`-call path (here the full forward-mode jacobian stack is
    computed once and sliced, which XLA dedupes anyway).
    """
    tape = _require_tape()
    if isinstance(xs, (list, tuple)):
        return [jacobian(ys, x, i, j) for x in xs]
    wrap_result = False
    if isinstance(ys, TapeArray):
        # a wrapped registered array (raw model output / derivative) routes
        # through the record path: get_component caches per (stack, dmulti),
        # so the same sub-derivative requested by several expressions (u__x
        # in both continuity and momentum_x) is computed ONCE — the jvp
        # chains of the per-expression tracked path are only CSE-dedupable
        # forward, and their backward graphs duplicated work (measured 83x
        # vs 38x fwd-equivalents on the NS residual valgrad). The result is
        # re-wrapped so composed expressions stay differentiable.
        rec0 = tape.lookup(ys.value)
        if rec0 is not None and isinstance(rec0.stack, _DerivStack):
            ys = ys.value
            wrap_result = True
        else:
            return _tracked_jacobian(tape, ys, xs, i, j)
    if isinstance(xs, TapeArray):
        xs = xs.value
    rec = tape.lookup(ys)
    if rec is None:
        raise ValueError(
            "ys is not on the autodiff tape; differentiate model outputs or "
            "derivatives thereof (arrays produced inside equation evaluation)"
        )
    col = _resolve_input_col(tape, rec, xs, j)
    rec = _Record(rec.stack, rec.out_col + i, rec.dmulti)
    out = tape.derivative(rec, col)
    if wrap_result:
        return TapeArray(out, _record_pf(rec.stack, rec.out_col, rec.dmulti + (col,)), rec.stack)
    return out


def _tracked_jacobian(tape: Tape, ys: TapeArray, xs, i: int, j: Optional[int]) -> TapeArray:
    """Derivative of a composed expression: nested jvp on the point function,
    vmapped over the stack's collocation batch."""
    stack = ys.stack
    xs_val = xs.value if isinstance(xs, TapeArray) else xs
    name = tape.coord_name(xs_val)
    if name is not None:
        if name not in stack.key_index:
            raise ValueError(f"coordinate '{name}' is not an input of the differentiated model")
        col = stack.key_index[name]
    elif j is not None:
        col = int(j)
    else:
        raise ValueError(
            "xs is not a registered input coordinate of the current tape; "
            "pass one of the arrays from the constraint input dict"
        )
    f = ys.pf
    d = stack.x.shape[-1]

    def dpf(xvec, extras, _f=f, _col=col, _d=d, _i=i):
        tangent = jnp.zeros((_d,)).at[_col].set(1.0)
        res = jax.jvp(lambda v: _f(v, extras), (xvec,), (tangent,))[1]
        # always slice one column — returning all columns for i=0 on a
        # multi-column output would broadcast inconsistently (ADVICE r1)
        return res[_i : _i + 1]

    val = jax.vmap(dpf)(stack.x, stack.extras)
    return TapeArray(val, dpf, stack)


def hessian(
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    component: Optional[int] = None,
    i: int = 0,
    j: int = 0,
) -> jnp.ndarray:
    """Second derivative d2(ys)/d(xs_i)d(xs_j) (reference ad.py:239-303).

    With single-column coordinate arrays (the framework convention) i=j=0 and
    this equals ``jacobian(jacobian(ys, xs), xs)`` — computed directly from
    the order-2 stack.
    """
    tape = _require_tape()
    wrap_result = False
    if isinstance(ys, TapeArray):
        rec0 = tape.lookup(ys.value)
        if rec0 is not None and isinstance(rec0.stack, _DerivStack):
            ys = ys.value  # registered: cached record path
            wrap_result = True
        else:
            first = _tracked_jacobian(tape, ys, xs, component or 0, i if xs is None else None)
            return _tracked_jacobian(tape, first, xs, 0, j if xs is None else None)
    if isinstance(xs, TapeArray):
        xs = xs.value
    rec = tape.lookup(ys)
    if rec is None:
        raise ValueError("ys is not on the autodiff tape")
    out_col = rec.out_col + (component if component is not None else 0)
    name = tape.coord_name(xs)
    if name is not None:
        if name not in rec.stack.key_index:
            raise ValueError(f"coordinate '{name}' is not an input of the differentiated model")
        ci = cj = rec.stack.key_index[name]
    elif xs is None:
        ci, cj = int(i), int(j)
    else:
        raise ValueError(
            "xs is not a registered input coordinate; pass one of the arrays "
            "from the constraint input dict (or xs=None with explicit i/j "
            "input-column indices)"
        )
    dmulti = rec.dmulti + (ci, cj)
    comp = rec.stack.get_component(dmulti)
    out = comp[..., out_col][..., None]
    tape.register_output(out, rec.stack, out_col, dmulti)
    if wrap_result:
        return TapeArray(out, _record_pf(rec.stack, out_col, dmulti), rec.stack)
    return out


def clear() -> None:
    """Drop cached derivative stacks (reference ad.py:326-341). Inside a jit
    trace each step opens a fresh tape, so this is only needed for manual
    multi-batch loops sharing one tape."""
    tape = current_tape()
    if tape is not None:
        tape.clear()


# -- standalone functional API -------------------------------------------------


def jacobian_fn(fn: Callable, argnums: int = 0) -> Callable:
    """Functional jacobian for a pointwise fn (d,)->(m,), vmapped over a
    leading batch axis: returns g(x: (N,d)) -> (N, m, d).

    Examples:
        >>> import jax.numpy as jnp
        >>> from paddlescience_tpu.autodiff import jacobian_fn
        >>> g = jacobian_fn(lambda x: x ** 3)
        >>> g(jnp.array([[2.0]])).shape
        (1, 1, 1)
        >>> float(g(jnp.array([[2.0]]))[0, 0, 0])  # d(x^3)/dx at x=2
        12.0
    """
    return jax.vmap(jax.jacfwd(fn, argnums=argnums))


def hessian_fn(fn: Callable, argnums: int = 0) -> Callable:
    """Functional hessian (forward-over-forward): g(x: (N,d)) -> (N, m, d, d).

    Examples:
        >>> import jax.numpy as jnp
        >>> from paddlescience_tpu.autodiff import hessian_fn
        >>> h = hessian_fn(lambda x: x ** 3)
        >>> float(h(jnp.array([[2.0]]))[0, 0, 0, 0])  # d2(x^3)/dx2 at x=2
        12.0
    """
    return jax.vmap(jax.jacfwd(jax.jacfwd(fn, argnums=argnums), argnums=argnums))
