"""PINN backbone MLP family.

TPU-native counterparts of reference ``ppsci/arch/mlp.py``:
  * ``WeightNormLinear``            (mlp.py:31)
  * ``RandomWeightFactorization``   (mlp.py:56)
  * ``PeriodEmbedding``             (mlp.py:95)
  * ``FourierEmbedding``            (mlp.py:117)
  * ``MLP``                         (mlp.py:139)
  * ``ModifiedMLP``                 (mlp.py:318)
  * ``PirateNetBlock`` / ``PirateNet`` (mlp.py:530/624)

Same forward math (so convergence recipes transfer), implemented on the
framework's pure-pytree module system (``psci.nn``) — matmuls map straight
onto the MXU and the whole net nests cleanly under vmap∘jacfwd∘jacfwd.
All layers accept arbitrary leading batch dims so derivative stacks can
vmap pointwise.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import activation as act_mod
from paddlescience_tpu.arch import base
from paddlescience_tpu.autodiff import jet
from paddlescience_tpu.autodiff import path as deriv_path
from paddlescience_tpu.nn.core import Buffer, Lambda, Module, Param, Rngs
from paddlescience_tpu.nn.layers import Linear
from paddlescience_tpu.utils import initializer

__all__ = [
    "WeightNormLinear",
    "RandomWeightFactorization",
    "PeriodEmbedding",
    "FourierEmbedding",
    "MLP",
    "ModifiedMLP",
    "PirateNetBlock",
    "PirateNet",
]


class WeightNormLinear(Module):
    """y = x @ (g * v / ||v||_col) + b. Reference mlp.py:31."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True, *, rngs: Rngs):
        self.weight_v = Param(initializer.xavier_uniform_()(rngs.params(), (in_features, out_features)))
        self.weight_g = Param(jnp.ones((out_features,)))
        self._use_bias = bias
        if bias:
            self.bias = Param(jnp.zeros((out_features,)))

    def __call__(self, x):
        v = self.weight_v
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        y = x @ (self.weight_g * v / norm)
        if self._use_bias:
            y = y + self.bias
        return y


class RandomWeightFactorization(Module):
    """W = g * v with g = exp(N(mean, std)) at init and v = W0/g (W0 glorot
    normal), so the effective initial weight equals W0. Reference mlp.py:56."""

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        mean: float = 0.5,
        std: float = 0.1,
        *,
        rngs: Rngs,
    ):
        w0 = initializer.glorot_normal_(rngs.params(), (in_features, out_features))
        g = jnp.exp(mean + std * jax.random.normal(rngs.params(), (out_features,)))
        self.weight_g = Param(g)
        self.weight_v = Param(w0 / g)
        self._use_bias = bias
        if bias:
            self.bias = Param(jnp.zeros((out_features,)))

    def __call__(self, x):
        y = x @ (self.weight_g * self.weight_v)
        if self._use_bias:
            y = y + self.bias
        return y


class PeriodEmbedding(Module):
    """Replace key k's column with [cos(w x_k), sin(w x_k)], w = 2*pi/period,
    optionally trainable. Reference mlp.py:95."""

    def __init__(self, periods: Dict[str, Tuple[float, bool]], *, rngs: Rngs = None):
        self.keys = tuple(periods.keys())
        for k, (p, trainable) in periods.items():
            w = jnp.asarray(2 * math.pi / float(p), jnp.float32)
            setattr(self, f"freq_{k}", Param(w) if trainable else Buffer(w))

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        y = dict(x)
        for k in self.keys:
            w = getattr(self, f"freq_{k}")
            y[k] = jnp.concatenate([jnp.cos(w * x[k]), jnp.sin(w * x[k])], axis=-1)
        return y


class FourierEmbedding(Module):
    """Random Fourier features [cos(xB), sin(xB)], B ~ N(0, scale^2).
    Reference mlp.py:117 (kernel is trainable, matching reference)."""

    def __init__(self, in_features: int, out_features: int, scale: float, *, rngs: Rngs):
        if out_features % 2 != 0:
            raise ValueError(f"out_features must be even, but got {out_features}.")
        self.kernel = Param(scale * jax.random.normal(rngs.params(), (in_features, out_features // 2)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = x @ self.kernel
        return jnp.concatenate([jnp.cos(z), jnp.sin(z)], axis=-1)


def _make_linear(
    in_features: int,
    out_features: int,
    weight_norm: bool,
    random_weight: Optional[Dict[str, float]],
    rngs: Rngs,
    kernel_init=None,
):
    if weight_norm:
        return WeightNormLinear(in_features, out_features, rngs=rngs)
    if random_weight:
        return RandomWeightFactorization(
            in_features, out_features, mean=random_weight["mean"], std=random_weight["std"], rngs=rngs
        )
    return Linear(in_features, out_features, kernel_init=kernel_init, rngs=rngs)


def _make_act(name: str, size: int, rngs: Rngs) -> Module:
    act = act_mod.get_activation(name)
    if act is act_mod.Stan:
        return act(size, rngs=rngs)
    if act is act_mod.Swish:
        return act(1.0, rngs=rngs)
    if act is act_mod.Siren:
        return Lambda(act())
    return Lambda(act)


def _linear_eff(layer):
    """Effective (W, b) of any linear flavor — constant w.r.t. coordinates,
    differentiable w.r.t. the underlying parameters."""
    if isinstance(layer, WeightNormLinear):
        v = layer.weight_v
        w = layer.weight_g * v / jnp.linalg.norm(v, axis=0, keepdims=True)
    elif isinstance(layer, RandomWeightFactorization):
        w = layer.weight_g * layer.weight_v
    else:
        w = layer.weight
    return w, (layer.bias if layer._use_bias else None)


def _stage_leaf_ranges(stage_subtrees):
    """Map each stage's weight subtree to its index range in the flattened
    full-``ws`` leaf list (``SegmentSpec.stage_ws_idx``). Leaf counts are
    computed per subtree because ``None`` biases drop out of the flatten."""
    idx, start = [], 0
    for sub in stage_subtrees:
        n = len(jax.tree_util.tree_leaves(sub))
        idx.append(tuple(range(start, start + n)))
        start += n
    return tuple(idx)


def _jet_linear(layer, jx: "jet.Jet") -> "jet.Jet":
    """Apply any of the three linear flavors to a Jet: resolve the effective
    weight once, then one stacked matmul."""
    w, b = _linear_eff(layer)
    return jet.linear(jx, w, b)


def _jet_gate(y: "jet.Jet", u: "jet.Jet", v: "jet.Jet") -> "jet.Jet":
    """y*u + (1-y)*v == v + y*(u-v): one jet product instead of two."""
    return jet.add(v, jet.mul(y, jet.sub(u, v)))


def _piratenet_block_fn(act1, act2, act3):
    """Pure segment function for one PirateNet block (jet primitives only) —
    the body executed inside the fused Pallas kernel."""

    def fn(ws, y, u, v):
        w1, b1, w2, b2, w3, b3, alpha = ws
        f = jet.elementwise(jet.linear(y, w1, b1), act1)
        z1 = _jet_gate(f, u, v)
        g = jet.elementwise(jet.linear(z1, w2, b2), act2)
        z2 = _jet_gate(g, u, v)
        h = jet.elementwise(jet.linear(z2, w3, b3), act3)
        return (jet.add(jet.scale_const(h, alpha), jet.scale_const(y, 1 - alpha)),)

    return fn


def _piratenet_block_ws(block):
    w1, b1 = _linear_eff(block.linear1)
    w2, b2 = _linear_eff(block.linear2)
    w3, b3 = _linear_eff(block.linear3)
    return (w1, b1, w2, b2, w3, b3, block.alpha)


def _piratenet_blocks_fn(act_triples):
    """Segment function for a GROUP of consecutive PirateNet blocks — fewer
    kernel launches and 1/group the boundary-jet HBM traffic."""

    def fn(ws, y, u, v):
        for acts, w in zip(act_triples, ws):
            (y,) = _piratenet_block_fn(*acts)(w, y, u, v)
        return (y,)

    return fn


def _mlp_segment_fn(acts, gated: bool):
    """Segment function for ``len(acts)`` consecutive MLP layers
    (linear + activation [+ two-stream gate for ModifiedMLP])."""

    def fn(ws, y, *uv):
        for i, act in enumerate(acts):
            y = jet.elementwise(jet.linear(y, ws[2 * i], ws[2 * i + 1]), act)
            if gated:
                y = _jet_gate(y, uv[0], uv[1])
        return (y,)

    return fn


def _jet_pallas_ok(model, layers_acts, linears=()) -> bool:
    if deriv_path.flag("PSCI_JET_PALLAS", "1") != "1":
        return False
    from paddlescience_tpu.ops import jet_pallas

    if not jet_pallas.pallas_available():
        return False
    # narrow nets (hidden < 128 lanes, e.g. the cylinder 5x50 MLP) waste MXU
    # lanes in a hand-rolled kernel, so they are gated out by default — but
    # the kernel still wins when XLA's alternative bounces every small
    # stream array through HBM, so the autotuner's jet_pallas candidate
    # lifts the gate (PSCI_JET_PALLAS_MIN_LANES=0) and lets the stopwatch
    # decide (solver/autotune.py)
    if not jet_pallas.interpret_forced():
        min_lanes = int(deriv_path.flag("PSCI_JET_PALLAS_MIN_LANES", "128"))
        for l in linears:
            if _linear_out_features(l) < min_lanes:
                return False
    # parametric activations (Stan/Swish) close over Params the segment spec
    # can't route gradients to — those stay on the pure-JAX path
    return all(isinstance(a, Lambda) for a in layers_acts)


def _linear_out_features(layer) -> int:
    for attr in ("weight", "weight_v"):
        w = getattr(layer, attr, None)
        if w is not None:
            return int(w.shape[-1])
    return 0


def _jet_pallas_segments(model, jx, linears, acts, gated, uv=()):
    """Run (linear+act[+gate]) layers as fused Pallas segments of
    PSCI_JET_SEG layers each."""
    from paddlescience_tpu.ops import jet_pallas

    cache = getattr(model, "_jet_specs", None)
    if cache is None:
        cache = {}
        object.__setattr__(model, "_jet_specs", cache)
    # width-adaptive kernel shape (VERDICT r4 next #3): narrow nets (e.g. the
    # cylinder 5x50 MLP) are HBM-bound, not MXU-bound — fuse the WHOLE net
    # into one segment (boundary jets are the only HBM traffic) and widen the
    # batch tile so each kernel invocation still covers ~256x256 elements.
    width = max((_linear_out_features(l) for l in linears), default=256)
    seg_flag = deriv_path.flag("PSCI_JET_SEG", "")
    if seg_flag:
        g = int(seg_flag)
    else:
        g = len(linears) if width < 128 else 3
    bm_flag = deriv_path.flag("PSCI_JET_BLOCK_M", "")
    if bm_flag:
        bm = int(bm_flag)
    elif width < 128:
        bm = min(max(256, (256 * 256 // max(width, 1)) // 8 * 8), 2048)
    else:
        bm = 256
    batch = jx.streams[0].shape[0]
    bm = min(bm, max(-(-batch // 8) * 8, 8))  # never tile beyond the batch
    # None -> precision-aware default at lowering (jet_pallas._bwd_tile)
    bm_bwd_env = deriv_path.flag("PSCI_JET_BLOCK_M_BWD", "")
    bm_bwd = int(bm_bwd_env) if bm_bwd_env else None
    y = jx
    for s in range(0, len(linears), g):
        seg_l = linears[s : s + g]
        seg_a = acts[s : s + g]
        key = ("mlp_seg", s, len(seg_l), gated, y.index, g, bm, bm_bwd)
        if key not in cache:
            # per-layer stages let the backward kernel keep only one layer's
            # vjp residuals live (streaming backward, ops/jet_pallas.py)
            def _layer_stage(i, act):
                def stage(ws, y_, *uv_):
                    y_ = jet.elementwise(jet.linear(y_, ws[2 * i], ws[2 * i + 1]), act)
                    if gated:
                        y_ = _jet_gate(y_, uv_[0], uv_[1])
                    return (y_,)

                return stage

            cache[key] = jet_pallas.SegmentSpec(
                _mlp_segment_fn(tuple(seg_a), gated),
                y.index, n_in=1 + len(uv), n_out=1, block_m=bm,
                block_m_bwd=bm_bwd,
                interpret=jet_pallas.interpret_forced(),
                name="mlp_seg",
                stages=tuple(_layer_stage(i, a) for i, a in enumerate(seg_a)),
                # each stage's vjp differentiates only its own (w, b) leaves —
                # keeps the streaming backward's stack to one layer's grads
                stage_ws_idx=_stage_leaf_ranges(
                    [_linear_eff(l) for l in seg_l]
                ),
            )
        ws = []
        for l in seg_l:
            w, b = _linear_eff(l)
            ws += [w, b]
        y = jet_pallas.fused_jet_segment(cache[key], tuple(ws), y, *uv)
    return y


def _jet_embed(model, jx: "jet.Jet") -> "jet.Jet":
    """Period + Fourier embeddings on a Jet of the concatenated coordinates
    (input_keys order), mirroring the batched ``__call__`` path."""
    if model.periods:
        cols = jet.split(jx, [1] * len(model.input_keys))
        new_cols = []
        for k, c in zip(model.input_keys, cols):
            if k in model.periods:
                w = getattr(model.period_emb, f"freq_{k}")
                new_cols.append(
                    jet.concat(
                        [
                            jet.elementwise(c, lambda z, _w=w: jnp.cos(_w * z)),
                            jet.elementwise(c, lambda z, _w=w: jnp.sin(_w * z)),
                        ],
                        axis=-1,
                    )
                )
            else:
                new_cols.append(c)
        jx = jet.concat(new_cols, axis=-1)
    if model.fourier:
        z = jet.linear(jx, model.fourier_emb.kernel)
        jx = jet.concat(
            [jet.elementwise(z, jnp.cos), jet.elementwise(z, jnp.sin)], axis=-1
        )
    return jx


def _resolve_sizes(hidden_size, num_layers, what="num_layers"):
    if isinstance(hidden_size, (tuple, list)):
        if num_layers is not None:
            raise ValueError(f"{what} should be None when hidden_size is specified as a list")
        return list(hidden_size)
    if isinstance(hidden_size, int):
        if not isinstance(num_layers, int):
            raise ValueError(f"{what} should be an int when hidden_size is an int")
        return [hidden_size] * num_layers
    raise ValueError(f"hidden_size should be list of int or int, but got {type(hidden_size)}")


class MLP(base.Arch):
    """Multi layer perceptron network (reference ppsci/arch/mlp.py:139).

    Examples:
        >>> import jax.numpy as jnp
        >>> import paddlescience_tpu as psci
        >>> model = psci.arch.MLP(("x", "y"), ("u", "v"), 2, 16)
        >>> out = model({"x": jnp.ones((4, 1)), "y": jnp.zeros((4, 1))})
        >>> sorted(out)
        ['u', 'v']
        >>> out["u"].shape
        (4, 1)
    """

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        num_layers: Optional[int],
        hidden_size: Union[int, Sequence[int]],
        activation: str = "tanh",
        skip_connection: bool = False,
        weight_norm: bool = False,
        input_dim: Optional[int] = None,
        output_dim: Optional[int] = None,
        periods: Optional[Dict[str, Tuple[float, bool]]] = None,
        fourier: Optional[Dict[str, Union[float, int]]] = None,
        random_weight: Optional[Dict[str, float]] = None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.skip_connection = skip_connection
        self.periods = dict(periods) if periods else None
        self.fourier = dict(fourier) if fourier else None

        if self.periods:
            self.period_emb = PeriodEmbedding(self.periods, rngs=rngs)

        sizes = _resolve_sizes(hidden_size, num_layers)

        cur_size = len(self.input_keys) if input_dim is None else input_dim
        if input_dim is None and self.periods:
            cur_size += len(self.periods)  # each period-embedded key doubles

        if self.fourier:
            self.fourier_emb = FourierEmbedding(cur_size, self.fourier["dim"], self.fourier["scale"], rngs=rngs)
            cur_size = self.fourier["dim"]

        linears, acts = [], []
        for i, size in enumerate(sizes):
            kernel_init = None
            if activation == "siren":
                kernel_init = act_mod.Siren.first_layer_init if i == 0 else act_mod.Siren.hidden_layer_init()
            linears.append(_make_linear(cur_size, size, weight_norm, random_weight, rngs, kernel_init))
            acts.append(_make_act(activation, size, rngs))
            cur_size = size
        self.linears = linears
        self.acts = acts

        out_dim = len(self.output_keys) if output_dim is None else output_dim
        self.last_fc = _make_linear(cur_size, out_dim, False, random_weight, rngs)

    def forward_tensor(self, x):
        y = x
        skip = None
        for i, linear in enumerate(self.linears):
            y = linear(y)
            if self.skip_connection and i % 2 == 0:
                if skip is not None:
                    skip = y
                    y = y + skip
                else:
                    skip = y
            y = self.acts[i](y)
        return self.last_fc(y)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        if self.periods:
            x = self.period_emb(x)
        y = self.concat_to_tensor(x, self.input_keys, axis=-1)
        if self.fourier:
            y = self.fourier_emb(y)
        y = self.forward_tensor(y)
        y = self.split_to_dict(y, self.output_keys, axis=-1)
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y

    def supports_jet(self) -> bool:
        return self._input_transform is None and self._output_transform is None

    def jet_pallas_eligible(self) -> bool:
        """Structural eligibility for the fused Pallas jet segments — the
        autotuner (solver/autotune.py) only times the jet_pallas candidate
        when some model would actually take it."""
        return not self.skip_connection and _jet_pallas_ok(self, self.acts, self.linears)

    def forward_jet(self, jx: "jet.Jet") -> "jet.Jet":
        jx = _jet_embed(self, jx)
        # plain MLPs are shallow enough that XLA's fusion of the pure jet
        # path already wins; the Pallas segments pay off on the deep gated
        # stacks (ModifiedMLP / PirateNet). Opt in with PSCI_JET_PALLAS_MLP=1.
        if (
            not self.skip_connection
            and deriv_path.flag("PSCI_JET_PALLAS_MLP", "0") == "1"
            and _jet_pallas_ok(self, self.acts, self.linears)
        ):
            jx = _jet_pallas_segments(self, jx, self.linears, self.acts, gated=False)
            return _jet_linear(self.last_fc, jx)
        skip = None
        for i, linear in enumerate(self.linears):
            jx = _jet_linear(linear, jx)
            if self.skip_connection and i % 2 == 0:
                if skip is not None:
                    skip = jx
                    jx = jet.add(jx, skip)
                else:
                    skip = jx
            jx = jet.elementwise(jx, self.acts[i])
        return _jet_linear(self.last_fc, jx)


class ModifiedMLP(base.Arch):
    """Two-stream gated MLP (reference ppsci/arch/mlp.py:318;
    arXiv:2001.04536): y <- act(Wy) then y*u + (1-y)*v with shared gates."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        num_layers: int,
        hidden_size: int,
        activation: str = "tanh",
        skip_connection: bool = False,
        weight_norm: bool = False,
        input_dim: Optional[int] = None,
        output_dim: Optional[int] = None,
        periods: Optional[Dict[str, Tuple[float, bool]]] = None,
        fourier: Optional[Dict[str, Union[float, int]]] = None,
        random_weight: Optional[Dict[str, float]] = None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        if not isinstance(hidden_size, int):
            raise ValueError(f"hidden_size should be int, but got {type(hidden_size)}")
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.skip_connection = skip_connection
        self.periods = dict(periods) if periods else None
        self.fourier = dict(fourier) if fourier else None
        if self.periods:
            self.period_emb = PeriodEmbedding(self.periods, rngs=rngs)

        sizes = [hidden_size] * num_layers
        cur_size = len(self.input_keys) if input_dim is None else input_dim
        if input_dim is None and self.periods:
            cur_size += len(self.periods)
        if self.fourier:
            self.fourier_emb = FourierEmbedding(cur_size, self.fourier["dim"], self.fourier["scale"], rngs=rngs)
            cur_size = self.fourier["dim"]

        self.embed_u = _make_linear(cur_size, sizes[0], weight_norm, random_weight, rngs)
        self.embed_v = _make_linear(cur_size, sizes[0], weight_norm, random_weight, rngs)
        self.embed_act_u = _make_act(activation, sizes[0], rngs)
        self.embed_act_v = _make_act(activation, sizes[0], rngs)

        linears, acts = [], []
        for size in sizes:
            linears.append(_make_linear(cur_size, size, weight_norm, random_weight, rngs))
            acts.append(_make_act(activation, size, rngs))
            cur_size = size
        self.linears = linears
        self.acts = acts
        out_dim = len(self.output_keys) if output_dim is None else output_dim
        self.last_fc = _make_linear(cur_size, out_dim, False, random_weight, rngs)

    def forward_tensor(self, x):
        u = self.embed_act_u(self.embed_u(x))
        v = self.embed_act_v(self.embed_v(x))
        y = x
        skip = None
        for i, linear in enumerate(self.linears):
            y = linear(y)
            y = self.acts[i](y)
            y = y * u + (1 - y) * v
            if self.skip_connection and i % 2 == 0:
                if skip is not None:
                    skip = y
                    y = y + skip
                else:
                    skip = y
        return self.last_fc(y)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        x_identity = x
        if self._input_transform is not None:
            x = self._input_transform(x)
        if self.periods:
            x = self.period_emb(x)
        y = self.concat_to_tensor(x, self.input_keys, axis=-1)
        if self.fourier:
            y = self.fourier_emb(y)
        y = self.forward_tensor(y)
        y = self.split_to_dict(y, self.output_keys, axis=-1)
        if self._output_transform is not None:
            y = self._output_transform(x_identity, y)
        return y

    def supports_jet(self) -> bool:
        return self._input_transform is None and self._output_transform is None

    def jet_pallas_eligible(self) -> bool:
        return not self.skip_connection and _jet_pallas_ok(self, self.acts, self.linears)

    def forward_jet(self, jx: "jet.Jet") -> "jet.Jet":
        jx = _jet_embed(self, jx)
        u = jet.elementwise(_jet_linear(self.embed_u, jx), self.embed_act_u)
        v = jet.elementwise(_jet_linear(self.embed_v, jx), self.embed_act_v)
        y = jx
        if not self.skip_connection and _jet_pallas_ok(self, self.acts, self.linears):
            y = _jet_pallas_segments(self, y, self.linears, self.acts, gated=True, uv=(u, v))
            return _jet_linear(self.last_fc, y)
        skip = None
        for i, linear in enumerate(self.linears):
            y = _jet_linear(linear, y)
            y = jet.elementwise(y, self.acts[i])
            y = _jet_gate(y, u, v)
            if self.skip_connection and i % 2 == 0:
                if skip is not None:
                    skip = y
                    y = jet.add(y, skip)
                else:
                    skip = y
        return _jet_linear(self.last_fc, y)


class PirateNetBlock(Module):
    """Residual adaptive block (reference ppsci/arch/mlp.py:530;
    arXiv:2402.00326). x^{l+1} = alpha*h + (1-alpha)*x, alpha init 0."""

    def __init__(
        self,
        embed_dim: int,
        activation: str = "tanh",
        random_weight: Optional[Dict[str, float]] = None,
        *,
        rngs: Rngs,
    ):
        self.linear1 = _make_linear(embed_dim, embed_dim, False, random_weight, rngs)
        self.linear2 = _make_linear(embed_dim, embed_dim, False, random_weight, rngs)
        self.linear3 = _make_linear(embed_dim, embed_dim, False, random_weight, rngs)
        self.alpha = Param(jnp.zeros((1,)))
        self.act1 = _make_act(activation, embed_dim, rngs)
        self.act2 = _make_act(activation, embed_dim, rngs)
        self.act3 = _make_act(activation, embed_dim, rngs)

    def __call__(self, x, u, v):
        f = self.act1(self.linear1(x))
        z1 = f * u + (1 - f) * v
        g = self.act2(self.linear2(z1))
        z2 = g * u + (1 - g) * v
        h = self.act3(self.linear3(z2))
        return self.alpha * h + (1 - self.alpha) * x

    def forward_jet(self, x: "jet.Jet", u: "jet.Jet", v: "jet.Jet") -> "jet.Jet":
        f = jet.elementwise(_jet_linear(self.linear1, x), self.act1)
        z1 = _jet_gate(f, u, v)
        g = jet.elementwise(_jet_linear(self.linear2, z1), self.act2)
        z2 = _jet_gate(g, u, v)
        h = jet.elementwise(_jet_linear(self.linear3, z2), self.act3)
        return jet.add(jet.scale_const(h, self.alpha), jet.scale_const(x, 1 - self.alpha))


class PirateNet(base.Arch):
    """PirateNet (reference ppsci/arch/mlp.py:624; arXiv:2402.00326)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        num_blocks: int,
        hidden_size: int,
        activation: str = "tanh",
        weight_norm: bool = False,
        input_dim: Optional[int] = None,
        output_dim: Optional[int] = None,
        periods: Optional[Dict[str, Tuple[float, bool]]] = None,
        fourier: Optional[Dict[str, Union[float, int]]] = None,
        random_weight: Optional[Dict[str, float]] = None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        if not isinstance(hidden_size, int):
            raise ValueError(f"hidden_size should be int, but got {type(hidden_size)}")
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.periods = dict(periods) if periods else None
        self.fourier = dict(fourier) if fourier else None
        if self.periods:
            self.period_emb = PeriodEmbedding(self.periods, rngs=rngs)

        sizes = [hidden_size] * num_blocks
        cur_size = len(self.input_keys) if input_dim is None else input_dim
        if input_dim is None and self.periods:
            cur_size += len(self.periods)
        if self.fourier:
            self.fourier_emb = FourierEmbedding(cur_size, self.fourier["dim"], self.fourier["scale"], rngs=rngs)
            cur_size = self.fourier["dim"]

        self.embed_u = _make_linear(cur_size, sizes[0], weight_norm, random_weight, rngs)
        self.embed_v = _make_linear(cur_size, sizes[0], weight_norm, random_weight, rngs)
        self.embed_act_u = _make_act(activation, sizes[0], rngs)
        self.embed_act_v = _make_act(activation, sizes[0], rngs)

        blocks = []
        for size in sizes:
            blocks.append(PirateNetBlock(cur_size, activation=activation, random_weight=random_weight, rngs=rngs))
            cur_size = size
        self.blocks = blocks
        out_dim = len(self.output_keys) if output_dim is None else output_dim
        self.last_fc = _make_linear(cur_size, out_dim, False, random_weight, rngs)

    def forward_tensor(self, x):
        u = self.embed_act_u(self.embed_u(x))
        v = self.embed_act_v(self.embed_v(x))
        y = x
        for block in self.blocks:
            y = block(y, u, v)
        return self.last_fc(y)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self._input_transform is not None:
            x = self._input_transform(x)
        if self.periods:
            x = self.period_emb(x)
        y = self.concat_to_tensor(x, self.input_keys, axis=-1)
        if self.fourier:
            y = self.fourier_emb(y)
        y = self.forward_tensor(y)
        y = self.split_to_dict(y, self.output_keys, axis=-1)
        if self._output_transform is not None:
            y = self._output_transform(x, y)
        return y

    def supports_jet(self) -> bool:
        return self._input_transform is None and self._output_transform is None

    def jet_pallas_eligible(self) -> bool:
        return self._use_jet_pallas()

    def forward_jet(self, jx: "jet.Jet") -> "jet.Jet":
        jx = _jet_embed(self, jx)
        u = jet.elementwise(_jet_linear(self.embed_u, jx), self.embed_act_u)
        v = jet.elementwise(_jet_linear(self.embed_v, jx), self.embed_act_v)
        y = jx
        if self._use_jet_pallas():
            # groups of residual blocks run as one fused Pallas kernel:
            # matmuls + gates + jet chain rules stay in VMEM; only the
            # group-boundary jet streams touch HBM, and the Pallas backward
            # rematerializes group internals per batch tile (ops/jet_pallas.py)
            from paddlescience_tpu.ops import jet_pallas

            grp = int(deriv_path.flag("PSCI_JET_PBLOCK_GROUP", "3"))
            for i in range(0, len(self.blocks), grp):
                seg = self.blocks[i : i + grp]
                spec = self._jet_block_spec((i, len(seg)), y.index, seg)
                ws = tuple(_piratenet_block_ws(b) for b in seg)
                y = jet_pallas.fused_jet_segment(spec, ws, y, u, v)
            return _jet_linear(self.last_fc, y)
        # pure-JAX fallback: rematerialize each block in the backward pass so
        # only boundary jets round-trip through HBM (opt out: PSCI_JET_REMAT=0)
        remat = os.environ.get("PSCI_JET_REMAT", "1") == "1"
        for block in self.blocks:
            if remat:
                y = jax.checkpoint(
                    lambda y_, u_, v_, _b=block: _b.forward_jet(y_, u_, v_)
                )(y, u, v)
            else:
                y = block.forward_jet(y, u, v)
        return _jet_linear(self.last_fc, y)

    def _use_jet_pallas(self) -> bool:
        if deriv_path.flag("PSCI_JET_PALLAS", "1") != "1":
            return False
        from paddlescience_tpu.ops import jet_pallas

        if not jet_pallas.pallas_available():
            return False
        # parametric activations (Stan/Swish) close over Params the segment
        # spec can't route gradients to — keep those on the pure-JAX path
        return _jet_pallas_ok(
            self,
            [a for b in self.blocks for a in (b.act1, b.act2, b.act3)],
            [l for b in self.blocks for l in (b.linear1, b.linear2, b.linear3)],
        )

    def _jet_block_spec(self, seg_key, index, seg_blocks):
        from paddlescience_tpu.ops import jet_pallas

        cache = getattr(self, "_jet_specs", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_jet_specs", cache)
        bm = int(deriv_path.flag("PSCI_JET_BLOCK_M", "256"))
        # None -> precision-aware default at lowering (jet_pallas._bwd_tile)
        bm_bwd_env = deriv_path.flag("PSCI_JET_BLOCK_M_BWD", "")
        bm_bwd = int(bm_bwd_env) if bm_bwd_env else None
        key = (seg_key, index, bm, bm_bwd)
        if key not in cache:
            acts = tuple((b.act1, b.act2, b.act3) for b in seg_blocks)

            # one stage per residual block: the streaming backward keeps only
            # one block's vjp residuals live instead of the whole group's
            def _block_stage(i, a3):
                def stage(ws, y_, u_, v_):
                    return _piratenet_block_fn(*a3)(ws[i], y_, u_, v_)

                return stage

            cache[key] = jet_pallas.SegmentSpec(
                _piratenet_blocks_fn(acts),
                index, n_in=3, n_out=1, block_m=bm, block_m_bwd=bm_bwd,
                interpret=jet_pallas.interpret_forced(),
                name="piratenet_block",
                stages=tuple(_block_stage(i, a3) for i, a3 in enumerate(acts)),
                # each stage's vjp differentiates only its block's leaves —
                # keeps the streaming backward's stack to one block's grads
                stage_ws_idx=_stage_leaf_ranges(
                    [_piratenet_block_ws(b) for b in seg_blocks]
                ),
            )
        return cache[key]
