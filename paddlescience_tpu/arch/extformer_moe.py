"""ExtFormer-MoE building blocks — noisy top-k mixture-of-experts routing at
reference fidelity.

TPU-native counterpart of
``/root/reference/ppsci/arch/extformer_moe_utils.py:9-416`` (GatingNet
variants, aux losses, dispatchers) and
``extformer_moe_cuboid_encoder.py:1678-1877`` (MixtureLinear / MixtureFFN).

TPU-first design: experts live as STACKED weight tensors with a leading
expert axis — one einsum computes every expert on the MXU, and the leading
axis shards over the mesh "model" axis for expert parallelism (GSPMD
``parallel.mesh.param_spec`` rule; the reference routes per-expert
sub-batches through a Python LayerList on one GPU, sparse gather/scatter —
dynamic shapes XLA can't tile). The reference's "dense" dispatch_style
computes all experts then combines top-k (extformer_moe_cuboid_encoder.py:
1733-1743); that is exactly the static-shape formulation used here, so
routing math matches the reference while staying jit-compilable.

Noisy gating + auxiliary load-balancing losses follow reference
extformer_moe_utils.py:113-173: softmax logits, top-(k+1), renormalized
top-k gates, importance loss = CV^2 of summed routing weights, load loss =
CV^2 of the expected assignment probability under the gating noise
(Normal-CDF smoothing), styles "all" (global) and "cell" (per location).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Linear

__all__ = ["default_moe_config", "GatingNet", "MixtureLinear", "MixtureFFN"]

GATE_STYLES = (
    "linear",
    "spatial-latent",
    "cuboid-latent",
    "spatial-latent-linear",
    "cuboid-latent-linear",
)


def default_moe_config(**overrides) -> Dict:
    """Reference defaults (examples/extformer_moe/conf yaml:110-119)."""
    cfg = {
        "num_experts": 10,
        "out_planes": 4,  # top-k
        "importance_weight": 0.0,
        "load_weight": 0.0,
        "gate_style": "cuboid-latent",
        "dispatch_style": "dense",
        "aux_loss_style": "all",
        "use_ffn_moe": True,
        "use_linear_moe": False,
        "use_attn_moe": False,
    }
    cfg.update(overrides)
    return cfg


def _cv_squared(x, eps=1e-25):
    """Squared coefficient of variation over the last axis (reference
    extformer_moe_utils.py:30-31)."""
    return jnp.var(x, axis=-1) / (jnp.mean(x, axis=-1) ** 2 + eps)


def _normal_cdf(value):
    return 0.5 * (1.0 + jax.scipy.special.erf(value / math.sqrt(2.0)))


class GatingNet(Module):
    """Noisy top-k gate with latent/linear routing variants and
    load-balancing aux losses (reference extformer_moe_utils.py:9-315).

    ``style``: one of GATE_STYLES. Latent variants hold a learnable routing
    table over the static (T, H, W) expert grid; "-linear" variants blend the
    table with a per-token linear gate through a learnable combine weight.
    """

    def __init__(self, moe_config: Dict, input_shape: Tuple[int, int, int], in_channels: int, *, rngs: Rngs):
        self.num_experts = int(moe_config["num_experts"])
        self.out_planes = int(moe_config["out_planes"])
        self.aux_loss_style = moe_config.get("aux_loss_style", "all")
        self.importance_weight = float(moe_config.get("importance_weight", 0.0))
        self.load_weight = float(moe_config.get("load_weight", 0.0))
        self.style = moe_config.get("gate_style", "linear")
        if not (1 < self.out_planes <= self.num_experts):
            raise ValueError(f"out_planes must be in (1, num_experts], got {self.out_planes}")
        if self.style not in GATE_STYLES:
            raise ValueError(f"gate_style '{self.style}' not in {GATE_STYLES}")
        T, H, W = input_shape
        E = self.num_experts
        self.noise_lin = Linear(in_channels, E, bias=False, rngs=rngs)
        self.noise_eps = 1e-2

        bound = math.sqrt(3.0 / (self.out_planes / E))  # reference :197-199
        u = lambda shape: jax.random.uniform(rngs.params(), shape, minval=-bound, maxval=bound)
        if self.style in ("linear", "spatial-latent-linear", "cuboid-latent-linear"):
            self.lin = Linear(in_channels, E, bias=False, rngs=rngs)
        if self.style in ("spatial-latent", "spatial-latent-linear"):
            self.latent_table = Param(u((H, W, E)))
        if self.style in ("cuboid-latent", "cuboid-latent-linear"):
            self.latent_table = Param(u((T, H, W, E)))
        if self.style.endswith("-linear"):
            shape = (H, W, E, 2) if self.style.startswith("spatial") else (T, H, W, E, 2)
            self.combine_weight = Param(u(shape))

    # -- routing logits ------------------------------------------------------
    def _raw_logits(self, x):
        B, T, H, W, C = x.shape
        if self.style == "linear":
            return self.lin(x)
        table = self.latent_table
        if table.ndim == 3:  # spatial: (H, W, E) -> broadcast over (B, T)
            latent = jnp.broadcast_to(table[None, None], (B, T) + table.shape)
        else:  # cuboid: (T, H, W, E)
            latent = jnp.broadcast_to(table[None], (B,) + table.shape)
        if not self.style.endswith("-linear"):
            return latent
        linear = self.lin(x)
        both = jnp.stack([latent, linear], axis=-1)  # (B, T, H, W, E, 2)
        cw = self.combine_weight
        cw = cw[None, None] if cw.ndim == 4 else cw[None]
        return jnp.sum(both * cw, axis=-1)

    # -- aux losses (reference :36-111) --------------------------------------
    def _load_prob(self, clean, noisy, noise_std, top_values):
        """P(token routed to expert | gating noise): Normal-CDF smoothing
        around the top-k threshold (reference load_loss_{cell,all})."""
        k = self.out_planes
        thr_in = top_values[..., k : k + 1]  # (k+1)-th largest
        thr_out = top_values[..., k - 1 : k]  # k-th largest
        is_in = noisy > thr_in
        prob_in = _normal_cdf((clean - thr_in) / noise_std)
        prob_out = _normal_cdf((clean - thr_out) / noise_std)
        return jnp.where(is_in, prob_in, prob_out)

    def __call__(self, x, key: Optional[jax.Array] = None, eps: float = 1e-25):
        """x: (B, T, H, W, C). Returns (top_k_gates, top_k_indices, aux_loss);
        with ``key`` the gate is noisy and aux losses are computed (training
        mode, reference :119-124); without, routing is deterministic and
        aux_loss is 0."""
        B, T, H, W, C = x.shape
        E = self.num_experts
        k = self.out_planes
        raw_logits = self._raw_logits(x)
        training = key is not None
        if training:
            noise = jax.nn.softplus(self.noise_lin(x)) + self.noise_eps
            noisy_logits = raw_logits + jax.random.normal(key, raw_logits.shape) * noise
            logits = jax.nn.softmax(noisy_logits, axis=-1)
        else:
            logits = jax.nn.softmax(raw_logits, axis=-1)

        m = min(k + 1, E)
        top_logits, top_indices = jax.lax.top_k(logits, m)
        top_k_logits = top_logits[..., :k]
        top_k_indices = top_indices[..., :k]
        top_k_gates = top_k_logits / (jnp.sum(top_k_logits, axis=-1, keepdims=True) + eps)

        aux = jnp.zeros(())
        if training and (self.importance_weight or self.load_weight):
            # parity note: as in the reference, clean/noisy values enter the
            # load loss pre-softmax while the top-value thresholds are
            # post-softmax (extformer_moe_utils.py:151-164)
            if self.aux_loss_style == "cell":
                importance = jnp.mean(_cv_squared(jnp.sum(logits, axis=0)))
                prob = self._load_prob(raw_logits, noisy_logits, noise, top_logits)
                load = jnp.mean(_cv_squared(jnp.sum(prob, axis=0)))
            elif self.aux_loss_style == "all":
                flat = lambda a: a.reshape(B * T * H * W, -1)
                importance = _cv_squared(jnp.sum(flat(logits), axis=0))
                prob = self._load_prob(flat(raw_logits), flat(noisy_logits), flat(noise), flat(top_logits))
                load = _cv_squared(jnp.sum(prob, axis=0))
            else:
                raise NotImplementedError(f"aux_loss_style {self.aux_loss_style}")
            aux = self.importance_weight * importance + self.load_weight * load
        return top_k_gates, top_k_indices, aux


class _DenseCombine:
    """Dense dispatch (reference DenseDispatcher, extformer_moe_utils.py:
    402-416): all experts computed, top-k selected and gate-weighted.
    Static shapes — the TPU-native routing."""

    @staticmethod
    def combine(expert_out, gates, indices):
        # expert_out: (..., E, C); gates/indices: (..., K)
        sel = jnp.take_along_axis(expert_out, indices[..., None], axis=-2)  # (..., K, C)
        return jnp.sum(sel * gates[..., None], axis=-2)


class MixtureLinear(Module):
    """Top-k routed linear layer with stacked expert kernels (reference
    extformer_moe_cuboid_encoder.py:1678-1761)."""

    def __init__(self, in_dim: int, out_dim: int, expert_shape: Tuple[int, int, int],
                 moe_config: Dict, bias: bool = True, *, rngs: Rngs):
        E = int(moe_config["num_experts"])
        self.gate = GatingNet(moe_config, expert_shape, in_dim, rngs=rngs)
        s = math.sqrt(1.0 / in_dim)
        self.w = Param(s * jax.random.normal(rngs.params(), (E, in_dim, out_dim)))
        self._use_bias = bias
        if bias:
            self.b = Param(jnp.zeros((E, out_dim)))

    def __call__(self, x, key: Optional[jax.Array] = None):
        gates, idx, aux = self.gate(x, key)
        outs = jnp.einsum("bthwd,edc->bthwec", x, self.w)
        if self._use_bias:
            outs = outs + self.b
        return _DenseCombine.combine(outs, gates, idx), aux


class MixtureFFN(Module):
    """Top-k routed positionwise FFN with stacked expert weights (reference
    extformer_moe_cuboid_encoder.py:1764-1877; experts are PositionwiseFFN
    instances there — two gelu-activated linear layers here, matching the
    cuboid transformer's FFN)."""

    def __init__(self, units: int, hidden_size: int, expert_shape: Tuple[int, int, int],
                 moe_config: Dict, *, rngs: Rngs):
        E = int(moe_config["num_experts"])
        self.gate = GatingNet(moe_config, expert_shape, units, rngs=rngs)
        s_in = math.sqrt(1.0 / units)
        s_out = math.sqrt(1.0 / hidden_size)
        self.w_in = Param(s_in * jax.random.normal(rngs.params(), (E, units, hidden_size)))
        self.b_in = Param(jnp.zeros((E, hidden_size)))
        self.w_out = Param(s_out * jax.random.normal(rngs.params(), (E, hidden_size, units)))
        self.b_out = Param(jnp.zeros((E, units)))
        self.num_experts = E

    def __call__(self, x, key: Optional[jax.Array] = None):
        gates, idx, aux = self.gate(x, key)
        h = jax.nn.gelu(jnp.einsum("bthwd,edf->bthwef", x, self.w_in) + self.b_in)
        outs = jnp.einsum("bthwef,efd->bthwed", h, self.w_out) + self.b_out
        return _DenseCombine.combine(outs, gates, idx), aux
