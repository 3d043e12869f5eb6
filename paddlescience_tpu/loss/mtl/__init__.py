"""Multi-task loss aggregators (reference ``ppsci/loss/mtl``).

The reference aggregators are stateful nn.Layers calling ``.backward()``
internally (grad_norm.py:29-120, relobralo.py:24, pcgrad.py:27). Here they
are **pure functions over explicit state pytrees**, composed into the single
jitted train step:

  * weight-based aggregators (Sum, GradNorm, NTK, Relobralo) expose
    ``init_state()`` and ``aggregate(losses, state, step[, grad_norms, key])
    -> (total, new_state)``; GradNorm/NTK additionally set
    ``needs_grad_norms`` so the solver computes per-loss gradient norms
    (k extra vjp passes) only on update steps, under ``lax.cond`` — the
    same staleness amortization as the reference's update_freq.
  * gradient-surgery aggregators (PCGrad, AGDA) set ``needs_grads`` and
    expose ``transform_grads(per_loss_grads, state, key) -> (grad, state)``
    which replaces the summed gradient.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.flatten_util  # noqa: F401  (registers jax.flatten_util)
import jax.numpy as jnp

__all__ = ["LossAggregator", "Sum", "GradNorm", "NTK", "Relobralo", "PCGrad", "AGDA", "build_mtl_aggregator"]


class LossAggregator:
    """Base: plain weighted sum with unit weights."""

    should_persist: bool = False
    needs_grad_norms: bool = False  # solver supplies per-loss grad L2 norms
    needs_grads: bool = False  # solver supplies full per-loss grads

    def __init__(self, model=None, num_losses: int = 1):
        self.model = model
        self.num_losses = num_losses

    def init_state(self) -> Dict:
        return {}

    def aggregate(self, losses: Sequence[jnp.ndarray], state: Dict, step, grad_norms=None, key=None):
        total = jnp.sum(jnp.stack(list(losses)))
        return total, state


class Sum(LossAggregator):
    """Unweighted sum (reference mtl/sum.py:28)."""


class GradNorm(LossAggregator):
    """jaxpi-style gradient-norm-ratio EMA weights (reference
    mtl/grad_norm.py:29-120): w_i <- m*w_i + (1-m) * mean(|g|)/|g_i| every
    update_freq steps."""

    should_persist = True
    needs_grad_norms = True

    def __init__(self, model=None, num_losses: int = 1, update_freq: int = 1000, momentum: float = 0.9, init_weights: Optional[List[float]] = None):
        super().__init__(model, num_losses)
        self.update_freq = update_freq
        self.momentum = momentum
        if init_weights is not None and num_losses != len(init_weights):
            raise ValueError(
                f"Length of init_weights({len(init_weights)}) should be equal to num_losses({num_losses})."
            )
        self.init_weights = init_weights

    def init_state(self) -> Dict:
        w = jnp.array(self.init_weights, jnp.float32) if self.init_weights else jnp.ones(self.num_losses)
        return {"weight": w}

    def update_weights(self, state: Dict, grad_norms) -> Dict:
        """Pure weight refresh from per-loss grad norms — called by the
        solver's amortized update fn OUTSIDE the hot step (the in-step
        lax.cond carried the k extra vjp passes in the compiled program,
        doubling its counted FLOPs and HLO size)."""
        gn = jnp.maximum(grad_norms, 1e-12)
        new_w = jnp.mean(gn) / gn
        return {"weight": state["weight"] * self.momentum + new_w * (1 - self.momentum)}

    def aggregate(self, losses, state, step, grad_norms=None, key=None):
        weight = state["weight"]
        if grad_norms is not None:
            def update(w):
                return self.update_weights({"weight": w}, grad_norms)["weight"]

            weight = jax.lax.cond(step % self.update_freq == 0, update, lambda w: w, weight)
        total = jnp.sum(jax.lax.stop_gradient(weight) * jnp.stack(list(losses)))
        return total, {"weight": weight}


class NTK(LossAggregator):
    """NTK-trace-ratio weights (reference mtl/ntk.py:29): w_i = sum(|g|)/|g_i|
    refreshed every update_freq steps (no EMA)."""

    should_persist = True
    needs_grad_norms = True

    def __init__(self, model=None, num_losses: int = 1, update_freq: int = 1000):
        super().__init__(model, num_losses)
        self.update_freq = update_freq

    def init_state(self) -> Dict:
        return {"weight": jnp.ones(self.num_losses)}

    def update_weights(self, state: Dict, grad_norms) -> Dict:
        gn = jnp.maximum(grad_norms, 1e-12)
        return {"weight": jnp.sum(gn) / gn}

    def aggregate(self, losses, state, step, grad_norms=None, key=None):
        weight = state["weight"]
        if grad_norms is not None:
            def update(w):
                return self.update_weights({"weight": w}, grad_norms)["weight"]

            weight = jax.lax.cond(step % self.update_freq == 0, update, lambda w: w, weight)
        total = jnp.sum(jax.lax.stop_gradient(weight) * jnp.stack(list(losses)))
        return total, {"weight": weight}


class Relobralo(LossAggregator):
    """Relative loss balancing with random lookback (reference
    mtl/relobralo.py:24; arXiv:2110.09813)."""

    should_persist = True

    def __init__(self, model=None, num_losses: int = 1, alpha: float = 0.95, beta: float = 0.99, tau: float = 1.0, eps: float = 1e-8):
        super().__init__(model, num_losses)
        self.alpha = alpha
        self.beta = beta
        self.tau = tau
        self.eps = eps

    def init_state(self) -> Dict:
        return {
            "losses_init": jnp.zeros(self.num_losses),
            "losses_prev": jnp.zeros(self.num_losses),
            "lmbda": jnp.ones(self.num_losses),
        }

    def _bal(self, l1, l2):
        return self.num_losses * jax.nn.softmax(l1 / (self.tau * l2 + self.eps))

    def aggregate(self, losses, state, step, grad_norms=None, key=None):
        losses_vec = jax.lax.stop_gradient(jnp.stack(list(losses)))
        losses_stacked = jnp.stack(list(losses))

        def first(_):
            return jnp.ones(self.num_losses), losses_vec, losses_vec

        def later(_):
            if key is None:
                rho = jnp.float32(1.0)
            else:
                rho = jax.random.bernoulli(key, self.beta).astype(jnp.float32)
            lmbda_hist = rho * state["lmbda"] + (1 - rho) * self._bal(losses_vec, state["losses_init"])
            lmbda = self.alpha * lmbda_hist + (1 - self.alpha) * self._bal(losses_vec, state["losses_prev"])
            return lmbda, state["losses_init"], losses_vec

        lmbda, losses_init, losses_prev = jax.lax.cond(step == 0, first, later, None)
        total = jnp.sum(jax.lax.stop_gradient(lmbda) * losses_stacked)
        return total, {"losses_init": losses_init, "losses_prev": losses_prev, "lmbda": lmbda}


class PCGrad(LossAggregator):
    """Project conflicting gradients (reference mtl/pcgrad.py:27;
    arXiv:2001.06782): for each task grad g_i and a random order of others
    g_j, subtract the conflicting component (g_i.g_j < 0)."""

    needs_grads = True

    def init_state(self) -> Dict:
        return {}

    def transform_grads(self, per_loss_grads, state, key=None):
        flats, unravel = [], None
        for g in per_loss_grads:
            flat, unravel = jax.flatten_util.ravel_pytree(g)
            flats.append(flat)
        G = jnp.stack(flats)  # (K, P)
        K = G.shape[0]

        def project_one(i, G):
            gi = G[i]
            # subtract conflicting components of all other grads, in index order
            def body(j, g):
                gj = jax.lax.stop_gradient(G[j])
                dot = jnp.dot(g, gj)
                conflict = (dot < 0) & (j != i)
                coef = jnp.where(conflict, dot / (jnp.dot(gj, gj) + 1e-12), 0.0)
                return g - coef * gj

            return jax.lax.fori_loop(0, K, body, gi)

        projected = jnp.stack([project_one(i, G) for i in range(K)])
        merged = jnp.sum(projected, axis=0)
        return unravel(merged), state


class AGDA(LossAggregator):
    """Adaptive gradient descent ascent-style 2-task balancing (reference
    mtl/agda.py:26): normalize task grads and resolve conflicts by symmetric
    projection."""

    needs_grads = True

    def transform_grads(self, per_loss_grads, state, key=None):
        flats, unravel = [], None
        for g in per_loss_grads:
            flat, unravel = jax.flatten_util.ravel_pytree(g)
            flats.append(flat)
        G = jnp.stack(flats)
        norms = jnp.linalg.norm(G, axis=1, keepdims=True) + 1e-12
        Gn = G / norms * jnp.mean(norms)
        merged = jnp.sum(Gn, axis=0)
        return unravel(merged), state


def build_mtl_aggregator(cfg, model=None) -> LossAggregator:
    import copy

    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("name")
    cls = globals().get(name)
    if cls is None or not (isinstance(cls, type) and issubclass(cls, LossAggregator)):
        raise ValueError(f"unknown loss aggregator '{name}'")
    return cls(model, **cfg)
