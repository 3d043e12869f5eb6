"""Batched multivariate Taylor-jet forward — the fused derivative stack.

The generic derivative path (`autodiff/ad.py:_DerivStack.get_component`)
computes each requested component ``d^k u / dx_i dx_j`` as a vmapped nested
``jax.jvp`` over the pointwise model. XLA CSEs the shared primal chains, but
every tangent stream still runs its own per-layer elementwise chain-rule
graph — on TPU the step becomes HBM-bound in elementwise loop fusions
(measured: matmul 28% / copies 21% / elementwise 46% of step time on
PirateNet 9x256).

This module propagates ALL requested derivative components (orders 0..2,
including mixed partials) through the network in ONE forward pass:

  * every intermediate is a :class:`Jet` — a tuple of ``(N, w)`` stream
    arrays (stream 0 = primal) named by a :class:`JetIndex`
    (e.g. ``((), (0,), (1,), (1, 1))`` for ``u, u_t, u_x, u_xx``);
  * nonlinearities apply the closed-form jet chain rule
    (``σ(f)_i = σ'(f) f_i``, ``σ(f)_ij = σ''(f) f_i f_j + σ'(f) f_ij``)
    with ``σ'``/``σ''`` evaluated ONCE on the primal stream and shared by
    every derivative stream — the redundant per-tangent activation chains of
    nested jvp disappear, and each rule is a flat elementwise op over plain
    ``(N, w)`` arrays that XLA fuses freely.

Streams are deliberately kept as SEPARATE arrays rather than one stacked
``(S, N, w)`` tensor: profiling the stacked layout on a v5e showed XLA
spending 94% of step time in async slice/copy pairs materializing per-stream
views (each ``.at[0].add(bias)`` also copied the whole stack). Plain tuples
keep every op a clean full-array elementwise/matmul node.

The reference (``ppsci/autodiff/ad.py``) has no counterpart — its cached
``paddle.grad`` calls replay reverse-mode per component. This is the TPU-first
formulation of SURVEY §7.7's "fused derivative stack" flagship optimization.

Only first/second-order components are supported; higher orders fall back to
the nested-jvp path in ``ad.py`` (biharmonic-style 4th-order PDEs keep
working, just not through this fast path).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "Jet",
    "JetIndex",
    "build_index",
    "seed",
    "seed_const",
    "linear",
    "elementwise",
    "mul",
    "add",
    "sub",
    "scale_const",
    "add_const",
    "concat",
    "split",
]

Multi = Tuple[int, ...]

# "fused" (default): concatenate streams on the batch axis for ONE (S*N,in)
# dot per layer. "split": one (N,in)@(in,out) dot per stream — measured
# slightly leaner on paper, but the resulting long unbroken elementwise
# chains crash the v5e XLA priority-fusion pass (SIGILL in
# TpuPriorityFusionQueue::NormalizedComputationCost) on deep nets; the
# per-layer concat/split of "fused" bounds fusion regions and compiles
# everywhere.
_MATMUL_MODE = os.environ.get("PSCI_JET_MATMUL", "fused")


class JetIndex:
    """Ordered set of derivative multi-indices carried by a Jet.

    ``multis[0]`` is always ``()`` (the primal). Singletons precede pairs, and
    every pair's singletons are present (closure — required by the chain
    rule).
    """

    __slots__ = ("multis", "pos", "singles", "pairs")

    def __init__(self, multis: Sequence[Multi]):
        multis = tuple(tuple(sorted(m)) for m in multis)
        if not multis or multis[0] != ():
            raise ValueError("JetIndex must start with the primal ()")
        self.multis = multis
        self.pos: Dict[Multi, int] = {m: i for i, m in enumerate(multis)}
        self.singles: Tuple[Multi, ...] = tuple(m for m in multis if len(m) == 1)
        self.pairs: Tuple[Multi, ...] = tuple(m for m in multis if len(m) == 2)
        if any(len(m) > 2 for m in multis):
            raise ValueError(f"jet supports orders <= 2, got {multis}")
        for (i, j) in self.pairs:
            if (i,) not in self.pos or (j,) not in self.pos:
                raise ValueError(
                    f"pair ({i},{j}) requires singleton streams ({i},) and ({j},)"
                )

    def __len__(self):
        return len(self.multis)

    def __eq__(self, other):
        return isinstance(other, JetIndex) and self.multis == other.multis

    def __hash__(self):
        return hash(self.multis)


def build_index(dmultis: Sequence[Multi]) -> JetIndex:
    """Close a set of requested components over primal + singleton streams."""
    singles: List[Multi] = []
    pairs: List[Multi] = []
    seen = set()
    for m in dmultis:
        m = tuple(sorted(m))
        if m in seen or m == ():
            continue
        seen.add(m)
        if len(m) == 1:
            singles.append(m)
        elif len(m) == 2:
            pairs.append(m)
        else:
            raise ValueError(f"jet supports orders <= 2, got {m}")
    for (i, j) in pairs:
        for s in ((i,), (j,)):
            if s not in seen:
                seen.add(s)
                singles.append(s)
    return JetIndex([()] + sorted(singles) + sorted(pairs))


class Jet:
    """``streams``: tuple of (..., w) arrays aligned with ``index.multis``."""

    __slots__ = ("streams", "index")

    def __init__(self, streams: Sequence[jnp.ndarray], index: JetIndex):
        streams = tuple(streams)
        if len(streams) != len(index):
            raise ValueError(f"{len(streams)} streams != index size {len(index)}")
        self.streams = streams
        self.index = index

    @property
    def primal(self) -> jnp.ndarray:
        return self.streams[0]

    def component(self, dmulti: Multi) -> jnp.ndarray:
        return self.streams[self.index.pos[tuple(sorted(dmulti))]]

    def __repr__(self):
        return f"Jet(streams={self.index.multis}, shape={self.streams[0].shape})"


# Jet is a pytree (streams = children, index = static) so jets can cross
# jax.checkpoint / scan / jit boundaries — block-level rematerialization of
# the jet forward trades HBM round trips for recompute in the backward pass.
jax.tree_util.register_pytree_node(
    Jet,
    lambda j: (j.streams, j.index),
    lambda index, streams: Jet(streams, index),
)


def seed(x: jnp.ndarray, index: JetIndex) -> Jet:
    """Seed the coordinate jet: primal = x (N, d); singleton (i,) = e_i;
    pairs = 0 (coordinates are affine in themselves)."""
    d = x.shape[-1]
    streams = [x]
    for m in index.multis[1:]:
        if len(m) == 1:
            e = jnp.zeros((d,), x.dtype).at[m[0]].set(1.0)
            streams.append(jnp.broadcast_to(e, x.shape))
        else:
            streams.append(jnp.zeros_like(x))
    return Jet(streams, index)


def seed_const(c: jnp.ndarray, index: JetIndex) -> Jet:
    """A value constant w.r.t. the coordinates: derivative streams all zero."""
    z = jnp.zeros_like(c)
    return Jet([c] + [z] * (len(index) - 1), index)


# Per-context override of _MATMUL_MODE. Inside a Pallas jet-segment kernel
# the "fused" concat/split is a real VMEM copy (no XLA fusion pass to elide
# it), while per-stream dots compile cleanly under Mosaic — so the kernel
# tracer switches to "split" there (ops/jet_pallas.py sets this).
_MATMUL_MODE_OVERRIDE: list = []


class matmul_mode:
    """Context manager: temporarily force the jet linear lowering mode."""

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        _MATMUL_MODE_OVERRIDE.append(self.mode)

    def __exit__(self, *exc):
        _MATMUL_MODE_OVERRIDE.pop()


def linear(jet: Jet, w: jnp.ndarray, b=None) -> Jet:
    """Linear layer on every stream; bias on the primal only."""
    mode = _MATMUL_MODE_OVERRIDE[-1] if _MATMUL_MODE_OVERRIDE else _MATMUL_MODE
    if mode == "fused":
        s = len(jet.streams)
        cat = jnp.concatenate(jet.streams, axis=0)
        out = cat @ w
        outs = list(jnp.split(out, s, axis=0))
    else:
        outs = [s @ w for s in jet.streams]
    if b is not None:
        outs[0] = outs[0] + b
    return Jet(outs, jet.index)


def _d1(fn: Callable, p: jnp.ndarray) -> jnp.ndarray:
    return jax.jvp(fn, (p,), (jnp.ones_like(p),))[1]


def _d2(fn: Callable, p: jnp.ndarray) -> jnp.ndarray:
    g = lambda z: jax.jvp(fn, (z,), (jnp.ones_like(z),))[1]
    return jax.jvp(g, (p,), (jnp.ones_like(p),))[1]


def _tanh_rule(p):
    t = jnp.tanh(p)
    sp = 1.0 - t * t
    return t, sp, -2.0 * t * sp


def _sin_rule(p):
    s, c = jnp.sin(p), jnp.cos(p)
    return s, c, -s


def _cos_rule(p):
    s, c = jnp.sin(p), jnp.cos(p)
    return c, -s, -c


def _exp_rule(p):
    e = jnp.exp(p)
    return e, e, e


# closed-form (f, f', f'') rules keyed by function identity. These exist for
# SPEED on the jet hot path, not correctness: the jvp fallback below is exact
# too, but traces fn up to 3 times — inside a Pallas jet kernel the VPU is
# the bottleneck (piratenet_9x256 spends ~2.6x the MXU time on elementwise
# chain rules, BENCH_r04), and a rule guarantees ONE transcendental with all
# derivatives as cheap mults of the shared primal value.
_ELEMENTWISE_RULES = {
    jnp.tanh: _tanh_rule,
    jnp.sin: _sin_rule,
    jnp.cos: _cos_rule,
    jnp.exp: _exp_rule,
}


def elementwise(jet: Jet, fn: Callable) -> Jet:
    """Jet chain rule through an elementwise ``fn`` (activation / cos / sin).

    ``fn`` must act elementwise on its input (it may close over parameters
    that are constant w.r.t. the coordinates). σ' and σ'' come from a
    closed-form rule when the function is a registered primitive (tanh/sin/
    cos/exp — value-reusing, one transcendental), else from ``jax.jvp`` on
    the primal — exact either way, folded by XLA into the fusion.
    """
    idx = jet.index
    p = jet.streams[0]
    # unwrap parameterless Lambda modules (nn/core.py:277) so the identity
    # lookup sees the raw jnp function the arch registered
    raw = getattr(fn, "fn", fn)
    rule = _ELEMENTWISE_RULES.get(raw) if callable(raw) and raw.__hash__ else None
    if rule is not None:
        f0, sp, spp = rule(p)
        streams = [f0]
        if not idx.pairs:
            spp = None
    else:
        streams = [fn(p)]
        sp = _d1(fn, p)
        spp = _d2(fn, p) if idx.pairs else None
    for m in idx.multis[1:]:
        if len(m) == 1:
            streams.append(sp * jet.streams[idx.pos[m]])
        else:
            i, j = m
            fi = jet.streams[idx.pos[(i,)]]
            fj = jet.streams[idx.pos[(j,)]]
            streams.append(spp * fi * fj + sp * jet.streams[idx.pos[m]])
    return Jet(streams, idx)


def mul(a: Jet, b: Jet) -> Jet:
    """Hadamard product rule (for gated MLP mixes f*u + (1-f)*v)."""
    idx = a.index
    if b.index != idx:
        raise ValueError("jet product requires matching indices")
    sa, sb = a.streams, b.streams
    streams = [sa[0] * sb[0]]
    for m in idx.multis[1:]:
        k = idx.pos[m]
        if len(m) == 1:
            streams.append(sa[k] * sb[0] + sa[0] * sb[k])
        else:
            i, j = m
            ai, aj = sa[idx.pos[(i,)]], sa[idx.pos[(j,)]]
            bi, bj = sb[idx.pos[(i,)]], sb[idx.pos[(j,)]]
            streams.append(sa[k] * sb[0] + sa[0] * sb[k] + ai * bj + aj * bi)
    return Jet(streams, idx)


def add(a: Jet, b: Jet) -> Jet:
    if b.index != a.index:
        raise ValueError("jet add requires matching indices")
    return Jet([x + y for x, y in zip(a.streams, b.streams)], a.index)


def sub(a: Jet, b: Jet) -> Jet:
    if b.index != a.index:
        raise ValueError("jet sub requires matching indices")
    return Jet([x - y for x, y in zip(a.streams, b.streams)], a.index)


def scale_const(jet: Jet, c) -> Jet:
    """Multiply by a value constant w.r.t. coordinates (scalar or per-channel
    parameter): linearity scales every stream."""
    return Jet([s * c for s in jet.streams], jet.index)


def add_const(jet: Jet, c) -> Jet:
    """Add a coordinate-constant: primal stream only."""
    return Jet((jet.streams[0] + c,) + jet.streams[1:], jet.index)


def concat(jets: Sequence[Jet], axis: int = -1) -> Jet:
    idx = jets[0].index
    for j in jets[1:]:
        if j.index != idx:
            raise ValueError("jet concat requires matching indices")
    return Jet(
        [
            jnp.concatenate([j.streams[k] for j in jets], axis=axis)
            for k in range(len(idx))
        ],
        idx,
    )


def split(jet: Jet, widths: Sequence[int]) -> List[Jet]:
    out, ofs = [], 0
    for w in widths:
        out.append(Jet([s[..., ofs : ofs + w] for s in jet.streams], jet.index))
        ofs += w
    return out
