"""MoFlow — normalizing flow for molecular graph generation
(reference ``ppsci/arch/moflow_net.py`` + ``moflow_basic.py`` +
``moflow_glow.py``; Zang & Wang, KDD 2020).

Reference-fidelity structure, TPU-native parametrization:

* **bond flow** = Glow over per-node adjacency features: ActNorm +
  invertible 1x1 mixing + affine coupling per block (reference
  moflow_glow.py Glow);
* **atom flow** = GlowOnGraph: node-masked affine couplings whose scale and
  shift come from relational graph convolutions over the bond tensor
  (reference moflow_glow.py GlowOnGraph + moflow_basic.py GraphConv) — the
  atom latent is genuinely conditioned on the molecular graph;
* exact log-dets throughout; ``reverse`` inverts bonds first, then inverts
  atoms conditioned on the decoded bonds (the reference's generation order).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, Param, Rngs
from paddlescience_tpu.nn.layers import Linear

__all__ = ["MoFlowNet", "MoFlowProp"]


class _ActNorm(Module):
    """Per-feature affine with exact log-det (reference moflow_basic ActNorm;
    learnable init instead of data-dependent init — equivalent family)."""

    def __init__(self, dim: int):
        self.log_scale = Param(jnp.zeros((dim,)))
        self.bias = Param(jnp.zeros((dim,)))

    def __call__(self, x):
        y = (x + self.bias) * jnp.exp(self.log_scale)
        n_pos = int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1
        logdet = jnp.sum(self.log_scale) * n_pos
        return y, jnp.full((x.shape[0],), logdet)

    def reverse(self, y):
        return y * jnp.exp(-self.log_scale) - self.bias


class _Inv1x1(Module):
    """Invertible feature mixing (Glow's 1x1 conv; reference
    moflow_basic InvConv2d/InvRotationLU)."""

    def __init__(self, dim: int, *, rngs: Rngs):
        q, _ = jnp.linalg.qr(jax.random.normal(rngs.params(), (dim, dim)))
        self.w = Param(q)

    def __call__(self, x):
        y = x @ self.w
        n_pos = int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1
        logdet = jnp.linalg.slogdet(self.w)[1] * n_pos
        return y, jnp.full((x.shape[0],), logdet)

    def reverse(self, y):
        return jnp.linalg.solve(self.w.T, y[..., None])[..., 0]


class _AffineCoupling(Module):
    """x2' = x2 * sigmoid(s(x1)+2) + t(x1), split along features
    (reference moflow_basic AffineCoupling)."""

    def __init__(self, dim: int, hidden: int, *, rngs: Rngs):
        half = dim // 2
        self.net1 = Linear(half, hidden, rngs=rngs)
        self.net2 = Linear(hidden, 2 * (dim - half), rngs=rngs)
        self.half = half

    def _st(self, x1):
        st = self.net2(jax.nn.relu(self.net1(x1)))
        s, t = jnp.split(st, 2, axis=-1)
        return jax.nn.sigmoid(s + 2.0), t

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


class _Flow(Module):
    """Glow block stack: [ActNorm -> Inv1x1 -> AffineCoupling] x n_blocks
    (reference moflow_glow.py Glow)."""

    def __init__(self, dim: int, hidden: int, n_blocks: int, *, rngs: Rngs):
        layers = []
        for _ in range(n_blocks):
            layers.append(_ActNorm(dim))
            layers.append(_Inv1x1(dim, rngs=rngs))
            layers.append(_AffineCoupling(dim, hidden, rngs=rngs))
        self.layers = layers

    def __call__(self, x):
        logdet = jnp.zeros((x.shape[0],))
        for layer in self.layers:
            x, ld = layer(x)
            logdet = logdet + ld
        return x, logdet

    def reverse(self, z):
        for layer in reversed(self.layers):
            z = layer.reverse(z)
        return z


class _RelGraphConv(Module):
    """Relational graph convolution: per-bond-type message passing + self
    loop (reference moflow_basic.py GraphConv)."""

    def __init__(self, in_dim: int, out_dim: int, n_rels: int, *, rngs: Rngs):
        self.rel = [Linear(in_dim, out_dim, rngs=rngs) for _ in range(n_rels)]
        self.self_w = Linear(in_dim, out_dim, rngs=rngs)
        self.n_rels = n_rels

    def __call__(self, adj, x):
        # adj (B, R, N, N), x (B, N, D); degree-normalize per relation (the
        # reference normalizes the adjacency before the flow — keeps the
        # conditioning nets bounded so couplings can't cascade to inf)
        deg = jnp.clip(jnp.sum(adj, axis=-1, keepdims=True), 1.0, None)
        adj = adj / deg
        out = self.self_w(x)
        for r in range(self.n_rels):
            out = out + jnp.einsum("bij,bjd->bid", adj[:, r], self.rel[r](x))
        return out


class _GraphAffineCoupling(Module):
    """Node-masked affine coupling conditioned on the molecular graph
    (reference moflow_glow.py GraphAffineCoupling): kept nodes pass through,
    masked-out nodes transform with (s, t) computed by graph convs over the
    kept nodes."""

    def __init__(self, n_node: int, a_dim: int, b_dim: int, hidden: int,
                 mask_row_start: int, mask_row_stride: int, *, rngs: Rngs):
        self.gc1 = _RelGraphConv(a_dim, hidden, b_dim, rngs=rngs)
        self.gc2 = _RelGraphConv(hidden, hidden, b_dim, rngs=rngs)
        self.s_lin = Linear(hidden, a_dim, rngs=rngs)
        self.t_lin = Linear(hidden, a_dim, rngs=rngs)
        mask = np.zeros((n_node, 1), np.float32)
        mask[mask_row_start::mask_row_stride] = 1.0  # kept rows
        self.mask = jnp.asarray(mask)

    def _st(self, adj, x_kept):
        h = jax.nn.relu(self.gc1(adj, x_kept))
        h = jax.nn.relu(self.gc2(adj, h))
        return jax.nn.sigmoid(self.s_lin(h) + 2.0), self.t_lin(h)

    def __call__(self, adj, x):
        xk = x * self.mask
        s, t = self._st(adj, xk)
        y = xk + (1.0 - self.mask) * (x * s + t)
        logdet = jnp.sum(jnp.log(s) * (1.0 - self.mask), axis=(1, 2))
        return y, logdet

    def reverse(self, adj, y):
        yk = y * self.mask
        s, t = self._st(adj, yk)
        return yk + (1.0 - self.mask) * ((y - t) / s)


class _GlowOnGraph(Module):
    """Stack of graph couplings with alternating node masks (reference
    moflow_glow.py GlowOnGraph)."""

    def __init__(self, n_node: int, a_dim: int, b_dim: int, hidden: int,
                 n_blocks: int, *, rngs: Rngs):
        self.norms = [_ActNorm(a_dim) for _ in range(n_blocks)]
        self.couplings = [
            _GraphAffineCoupling(n_node, a_dim, b_dim, hidden,
                                 mask_row_start=i % 2, mask_row_stride=2, rngs=rngs)
            for i in range(n_blocks)
        ]

    def __call__(self, adj, x):
        logdet = jnp.zeros((x.shape[0],))
        for norm, coup in zip(self.norms, self.couplings):
            x, ld1 = norm(x)
            x, ld2 = coup(adj, x)
            logdet = logdet + ld1 + ld2
        return x, logdet

    def reverse(self, adj, z):
        for norm, coup in zip(reversed(self.norms), reversed(self.couplings)):
            z = coup.reverse(adj, z)
            z = norm.reverse(z)
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
        # bond Glow over flattened per-node adjacency features
        self.bond_flow = _Flow(b_n_type * a_n_node, b_hidden, b_n_blocks, rngs=rngs)
        # atom GlowOnGraph conditioned on the bond tensor
        self.atom_flow = _GlowOnGraph(a_n_node, a_n_type, b_n_type, a_hidden,
                                      a_n_blocks, rngs=rngs)

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        nodes = x[self.input_keys[0]]  # (B, N, a_dim)
        edges = x[self.input_keys[1]]  # (B, b_dim, N, N)
        B, N = nodes.shape[0], nodes.shape[1]
        adj_feat = edges.transpose(0, 2, 1, 3).reshape(B, N, -1)  # (B, N, b_dim*N)
        z_adj, ld_adj = self.bond_flow(adj_feat)
        z_x, ld_x = self.atom_flow(edges, nodes)
        z = jnp.concatenate([z_x.reshape(B, -1), z_adj.reshape(B, -1)], axis=-1)
        return {self.output_keys[0]: z, self.output_keys[1]: ld_adj + ld_x}

    def reverse(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """latent -> (nodes, edges): decode bonds first, then atoms
        conditioned on the decoded bonds (reference generation order)."""
        B = z.shape[0]
        n_x = self.n_node * self.a_dim
        z_x = z[:, :n_x].reshape(B, self.n_node, self.a_dim)
        z_adj = z[:, n_x:].reshape(B, self.n_node, self.b_dim * self.n_node)
        adj_feat = self.bond_flow.reverse(z_adj)
        edges = adj_feat.reshape(B, self.n_node, self.b_dim, self.n_node).transpose(0, 2, 1, 3)
        nodes = self.atom_flow.reverse(edges, z_x)
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
