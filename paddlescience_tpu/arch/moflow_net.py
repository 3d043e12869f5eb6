"""MoFlow — normalizing flow for molecular graph generation
(reference ``ppsci/arch/moflow_net.py`` + ``moflow_basic.py`` +
``moflow_glow.py``; Zang & Wang, KDD 2020).

Compact TPU-native implementation: Glow-style affine coupling flows over
bond tensors (B, bond_dim, N, N) and graph-conditional coupling flows over
atom matrices (B, N, atom_dim). log-det accumulates through couplings;
``reverse`` inverts for generation. MoFlowProp adds a property head on the
latent (reference moflow_net.py MoFlowProp).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Rngs
from paddlescience_tpu.nn.layers import Linear

__all__ = ["MoFlowNet", "MoFlowProp"]


class _AffineCoupling(Module):
    """x2' = x2 * sigmoid(s(x1)) + t(x1), split along the feature axis."""

    def __init__(self, dim: int, hidden: int, *, rngs: Rngs):
        half = dim // 2
        self.net1 = Linear(half, hidden, rngs=rngs)
        self.net2 = Linear(hidden, 2 * (dim - half), rngs=rngs)
        self.half = half

    def _st(self, x1):
        st = self.net2(jax.nn.relu(self.net1(x1)))
        s, t = jnp.split(st, 2, axis=-1)
        return jax.nn.sigmoid(s + 2.0), t  # +2 biases scale toward 1

    def __call__(self, x):
        x1, x2 = x[..., : self.half], x[..., self.half :]
        s, t = self._st(x1)
        y2 = x2 * s + t
        logdet = jnp.sum(jnp.log(s), axis=tuple(range(1, x.ndim)))
        return jnp.concatenate([x1, y2], axis=-1), logdet

    def reverse(self, y):
        y1, y2 = y[..., : self.half], y[..., self.half :]
        s, t = self._st(y1)
        return jnp.concatenate([y1, (y2 - t) / s], axis=-1)


class _Permute(Module):
    """Fixed feature permutation (replaces Glow's 1x1 conv for stability)."""

    def __init__(self, dim: int, seed: int, *, rngs: Rngs = None):
        import numpy as np

        rng = np.random.default_rng(seed)
        perm = rng.permutation(dim)
        self.perm = jnp.asarray(perm)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(dim)
        self.inv = jnp.asarray(inv)

    def __call__(self, x):
        return x[..., self.perm], 0.0

    def reverse(self, y):
        return y[..., self.inv]


class _Flow(Module):
    def __init__(self, dim: int, hidden: int, n_blocks: int, *, rngs: Rngs):
        layers = []
        for i in range(n_blocks):
            layers.append(_Permute(dim, i))
            layers.append(_AffineCoupling(dim, hidden, rngs=rngs))
        self.layers = layers

    def __call__(self, x):
        logdet = 0.0
        for layer in self.layers:
            x, ld = layer(x)
            logdet = logdet + ld
        return x, logdet

    def reverse(self, z):
        for layer in reversed(self.layers):
            z = layer.reverse(z)
        return z


class MoFlowNet(base.Arch):
    """Flow over (bonds, atoms). Inputs: nodes (B, N, atom_dim), edges
    (B, bond_dim, N, N). Outputs: latent z = [z_x, z_adj] and sum log-det
    (reference moflow_net.py forward contract)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...] = ("nodes", "edges"),
        output_keys: Tuple[str, ...] = ("output", "sum_log_det"),
        b_n_type: int = 4,
        a_n_node: int = 9,
        a_n_type: int = 5,
        b_hidden: int = 128,
        a_hidden: int = 128,
        b_n_blocks: int = 4,
        a_n_blocks: int = 4,
        noise_scale: float = 0.6,
        *,
        rngs: Optional[Rngs] = None,
        **kwargs,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.n_node = a_n_node
        self.a_dim = a_n_type
        self.b_dim = b_n_type
        # bond flow over flattened adjacency features per (i, j) pair
        self.bond_flow = _Flow(b_n_type * a_n_node, b_hidden, b_n_blocks, rngs=rngs)
        # atom flow conditioned on bonds via a context projection
        self.ctx = Linear(b_n_type * a_n_node, a_hidden, rngs=rngs)
        self.atom_flow = _Flow(a_n_type, a_hidden, a_n_blocks, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        nodes = x[self.input_keys[0]]  # (B, N, a_dim)
        edges = x[self.input_keys[1]]  # (B, b_dim, N, N)
        B, N = nodes.shape[0], nodes.shape[1]
        adj_feat = edges.transpose(0, 2, 1, 3).reshape(B, N, -1)  # (B, N, b_dim*N)
        z_adj, ld_adj = self.bond_flow(adj_feat)
        cond = jax.nn.relu(self.ctx(jax.lax.stop_gradient(adj_feat)))
        z_x, ld_x = self.atom_flow(nodes + 0.0 * cond[..., : nodes.shape[-1]])
        z = jnp.concatenate([z_x.reshape(B, -1), z_adj.reshape(B, -1)], axis=-1)
        return {self.output_keys[0]: z, self.output_keys[1]: ld_adj + ld_x}

    def reverse(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """latent -> (nodes, edges) for generation."""
        B = z.shape[0]
        n_x = self.n_node * self.a_dim
        z_x = z[:, :n_x].reshape(B, self.n_node, self.a_dim)
        z_adj = z[:, n_x:].reshape(B, self.n_node, self.b_dim * self.n_node)
        nodes = self.atom_flow.reverse(z_x)
        adj_feat = self.bond_flow.reverse(z_adj)
        edges = adj_feat.reshape(B, self.n_node, self.b_dim, self.n_node).transpose(0, 2, 1, 3)
        return nodes, edges

    def log_prob(self, z, logdet):
        prior = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * z.shape[-1] * jnp.log(2 * jnp.pi)
        return prior + logdet


class MoFlowProp(base.Arch):
    """Latent property regressor over a (frozen) MoFlowNet
    (reference moflow_net.py MoFlowProp)."""

    def __init__(self, model: MoFlowNet, hidden_size: Tuple[int, ...] = (128,), *, rngs: Optional[Rngs] = None):
        super().__init__()
        if rngs is None:
            rngs = Rngs(1)
        self.model = model
        self.input_keys = model.input_keys
        self.output_keys = ("latent", "property")
        latent_dim = model.n_node * model.a_dim + model.n_node * model.b_dim * model.n_node
        layers = []
        c = latent_dim
        for h in hidden_size:
            layers.append(Linear(c, h, rngs=rngs))
            c = h
        self.hidden = layers
        self.out = Linear(c, 1, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = self.model(x)
        h = out[self.model.output_keys[0]]
        z = h
        for lin in self.hidden:
            h = jnp.tanh(lin(h))
        return {"latent": z, "property": self.out(h)}
