"""Graph networks: message passing over static padded graphs.

TPU-native counterparts of the reference graph models:
  * CrystalGraphConvNet (ppsci/arch/crystalgraphconvnet.py) — CGCNN
  * TGCN                (ppsci/arch/tgcn.py) — temporal GCN + GRU
  * GraphMessagePassing / MeshGraphNet core — the encode-process-decode
    processor underlying AMGNet (ppsci/arch/amgnet.py), CFDGCN
    (ppsci/arch/cfdgcn.py) and GraphCastNet (ppsci/arch/graphcast.py)

TPU design: graphs are static padded edge lists; aggregation is
``jax.ops.segment_sum`` (lowered to sorted-segment ops, no dynamic shapes).
The reference relies on PGL + pyamg (AMG coarsening) + SU2 (CFD-in-the-loop)
— external dependencies not present here. AMGNet implements AMG-style greedy
aggregation itself (``AMGNet.coarsen``) for its graph U-Net; CFDGCN takes
any callable coarse solver (potential-flow surrogate in the example).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from paddlescience_tpu.arch import base
from paddlescience_tpu.nn.core import Module, ModuleList, Param, Rngs
from paddlescience_tpu.nn.layers import Conv, LayerNorm, Linear

__all__ = ["CrystalGraphConvNet", "TGCN", "MeshGraphNet", "AMGNet", "GraphCastNet", "CFDGCN"]


class _CGConvLayer(Module):
    """CGCNN gated neighbor aggregation (reference crystalgraphconvnet.py:7).
    BatchNorm1D is replaced by LayerNorm (stateless under jit; same
    role of stabilizing the gated sum)."""

    def __init__(self, atom_fea_len: int, nbr_fea_len: int, *, rngs: Rngs):
        self.atom_fea_len = atom_fea_len
        self.fc_full = Linear(2 * atom_fea_len + nbr_fea_len, 2 * atom_fea_len, rngs=rngs)
        self.norm1 = LayerNorm(2 * atom_fea_len)
        self.norm2 = LayerNorm(atom_fea_len)

    def __call__(self, atom_in_fea, nbr_fea, nbr_fea_idx):
        N, M = nbr_fea_idx.shape
        atom_nbr_fea = atom_in_fea[nbr_fea_idx]  # (N, M, F)
        total = jnp.concatenate(
            [jnp.broadcast_to(atom_in_fea[:, None], (N, M, self.atom_fea_len)), atom_nbr_fea, nbr_fea], axis=2
        )
        gated = self.norm1(self.fc_full(total))
        nbr_filter, nbr_core = jnp.split(gated, 2, axis=2)
        nbr_sumed = jnp.sum(jax.nn.sigmoid(nbr_filter) * jax.nn.softplus(nbr_core), axis=1)
        return jax.nn.softplus(atom_in_fea + self.norm2(nbr_sumed))


class CrystalGraphConvNet(base.Arch):
    """CGCNN property predictor. Inputs: atom_fea (N, F0), nbr_fea (N, M, Fn),
    nbr_fea_idx (N, M), crystal_atom_idx (list of index arrays per crystal)."""

    def __init__(
        self,
        orig_atom_fea_len: int,
        nbr_fea_len: int,
        atom_fea_len: int = 64,
        n_conv: int = 3,
        h_fea_len: int = 128,
        n_h: int = 1,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = ("i",)
        self.output_keys = ("out",)
        self.embedding = Linear(orig_atom_fea_len, atom_fea_len, rngs=rngs)
        self.convs = [_CGConvLayer(atom_fea_len, nbr_fea_len, rngs=rngs) for _ in range(n_conv)]
        self.conv_to_fc = Linear(atom_fea_len, h_fea_len, rngs=rngs)
        self.fcs = [Linear(h_fea_len, h_fea_len, rngs=rngs) for _ in range(n_h - 1)]
        self.fc_out = Linear(h_fea_len, 1, rngs=rngs)

    def __call__(self, x: Dict) -> Dict[str, jnp.ndarray]:
        atom_fea, nbr_fea, nbr_fea_idx, crystal_atom_idx = x[self.input_keys[0]]
        h = self.embedding(atom_fea)
        for conv in self.convs:
            h = conv(h, nbr_fea, nbr_fea_idx)
        # crystal pooling: mean over each crystal's atoms
        pooled = jnp.stack([jnp.mean(h[idx], axis=0) for idx in crystal_atom_idx])
        z = jax.nn.softplus(self.conv_to_fc(jax.nn.softplus(pooled)))
        for fc in self.fcs:
            z = jax.nn.softplus(fc(z))
        return {self.output_keys[0]: self.fc_out(z)}


class _GRUCell(Module):
    def __init__(self, in_dim, hidden, *, rngs: Rngs):
        self.wz = Linear(in_dim + hidden, hidden, rngs=rngs)
        self.wr = Linear(in_dim + hidden, hidden, rngs=rngs)
        self.wh = Linear(in_dim + hidden, hidden, rngs=rngs)

    def __call__(self, x, h):
        xh = jnp.concatenate([x, h], axis=-1)
        z = jax.nn.sigmoid(self.wz(xh))
        r = jax.nn.sigmoid(self.wr(xh))
        hh = jnp.tanh(self.wh(jnp.concatenate([x, r * h], axis=-1)))
        return (1 - z) * h + z * hh


class _BatchStatNorm(Module):
    """Per-channel normalization with current-batch statistics + learnable
    scale/shift — the jit-functional stand-in for the reference's
    BatchNorm2D (tgcn.py bn1/bn2). No running stats: eval normalizes with
    the eval batch's own statistics (documented deviation; TGCN evals run
    full-split batches where the two coincide)."""

    def __init__(self, channels, *, rngs: Rngs):
        self.scale = Param(jnp.ones((channels,)))
        self.shift = Param(jnp.zeros((channels,)))

    def __call__(self, x):  # (..., C), stats over all leading axes
        axes = tuple(range(x.ndim - 1))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * self.scale + self.shift


class _TempolConv(Module):
    """Dilated temporal conv stack (reference tgcn.py tempol_conv:38-72):
    num_layer dilated (1, k_s) convs with LeakyReLU, dense concat, 1x1 mix.
    Channel-last layout (B, N, T, C)."""

    def __init__(self, in_dim, out_dim, hidden, num_layer=3, k_s=3, alpha=0.1, *, rngs: Rngs):
        self.alpha = alpha
        self.convs = ModuleList([
            Conv(in_dim if i == 0 else hidden, hidden, (1, k_s),
                 padding=[(0, 0), (i + 1, i + 1)], dilation=(1, i + 1), rngs=rngs)
            for i in range(num_layer)
        ])
        self.mlp = Conv(in_dim + hidden * num_layer, out_dim, (1, 1), rngs=rngs)

    def __call__(self, x):
        cat = [x]
        for conv in self.convs:
            x = jax.nn.leaky_relu(conv(x), self.alpha)
            cat.append(x)
        return self.mlp(jnp.concatenate(cat, axis=-1))


class _GraphConv(Module):
    """K-hop dense-adjacency propagation + 1x1 mix (reference tgcn.py
    graph_conv:12-35). Dropout after the mix when a train key is given."""

    def __init__(self, in_dim, out_dim, dropout, num_layer=2, *, rngs: Rngs):
        self.mlp = Conv((num_layer + 1) * in_dim, out_dim, (1, 1), rngs=rngs)
        self.num_layer = num_layer
        self.dropout = float(dropout)

    def __call__(self, x, adj, key=None):  # x (B, N, T, C)
        out = [x]
        for _ in range(self.num_layer):
            x = jnp.einsum("mn,bntc->bmtc", adj, x)
            out.append(x)
        h = self.mlp(jnp.concatenate(out, axis=-1))
        if key is not None and self.dropout > 0.0:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(key, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        return h


class TGCN(base.Arch):
    """Temporal Graph Convolutional Network (reference ppsci/arch/tgcn.py:
    74-200): 1x1 embedding conv, two [dilated temporal conv -> K-hop graph
    conv -> residual -> batch norm] stages, dense readout over the
    concatenated features, (1, input_len) reduction to label_len steps.
    Input (B, T, N, C) -> output (B, label_len, N, 1)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        adj: jnp.ndarray,
        in_dim: int = 1,
        emb_dim: int = 32,
        hidden: int = 64,
        gc_layer: int = 2,
        tc_layer: int = 2,
        k_s: int = 3,
        dropout: float = 0.25,
        alpha: float = 0.1,
        input_len: int = 12,
        label_len: int = 12,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.adj = jnp.asarray(adj, jnp.float32)
        self._train_rng = None

        self.emb_conv = Conv(in_dim, emb_dim, (1, 1), rngs=rngs)
        self.tc1 = _TempolConv(emb_dim, hidden, hidden, tc_layer, k_s, alpha, rngs=rngs)
        self.sc1 = _GraphConv(hidden, hidden, dropout, gc_layer, rngs=rngs)
        self.bn1 = _BatchStatNorm(hidden, rngs=rngs)
        self.tc2 = _TempolConv(hidden, hidden, hidden, tc_layer, k_s, alpha, rngs=rngs)
        self.sc2 = _GraphConv(hidden, hidden, dropout, gc_layer, rngs=rngs)
        self.bn2 = _BatchStatNorm(hidden, rngs=rngs)
        self.end_conv_1 = Conv(emb_dim + 2 * hidden, 2 * hidden, (1, 1), rngs=rngs)
        # (1, input_len) VALID conv collapses T; channels become label_len
        self.end_conv_2 = Conv(2 * hidden, label_len, (1, input_len),
                               padding=[(0, 0), (0, 0)], rngs=rngs)

    def set_train_rng(self, key) -> None:
        """Per-step dropout key (installed by the solver's train step)."""
        self._train_rng = key

    def __call__(self, x: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        seq = x[self.input_keys[0]]  # (B, T, N, C)
        h = jnp.transpose(seq, (0, 2, 1, 3))  # (B, N, T, C) channel-last
        k1 = k2 = None
        if self._train_rng is not None:
            k1, k2 = jax.random.split(self._train_rng)

        emb = self.emb_conv(h)
        tc1 = self.tc1(emb)
        sc1 = self.bn1(self.sc1(tc1, self.adj, k1) + tc1)
        tc2 = self.tc2(sc1)
        sc2 = self.bn2(self.sc2(tc2, self.adj, k2) + tc2)
        out = jax.nn.relu(jnp.concatenate([emb, sc1, sc2], axis=-1))
        out = jax.nn.relu(self.end_conv_1(out))
        out = self.end_conv_2(out)  # (B, N, 1, label_len)
        out = jnp.transpose(out, (0, 3, 1, 2))  # (B, label_len, N, 1)
        return {self.output_keys[0]: out}


class _MPBlock(Module):
    """Edge+node message-passing block (MeshGraphNet style)."""

    def __init__(self, dim, *, rngs: Rngs):
        self.edge_fc1 = Linear(3 * dim, dim, rngs=rngs)
        self.edge_fc2 = Linear(dim, dim, rngs=rngs)
        self.edge_norm = LayerNorm(dim)
        self.node_fc1 = Linear(2 * dim, dim, rngs=rngs)
        self.node_fc2 = Linear(dim, dim, rngs=rngs)
        self.node_norm = LayerNorm(dim)

    def __call__(self, nodes, edges, senders, receivers):
        e_in = jnp.concatenate([edges, nodes[senders], nodes[receivers]], axis=-1)
        e = self.edge_norm(self.edge_fc2(jax.nn.relu(self.edge_fc1(e_in)))) + edges
        agg = jax.ops.segment_sum(e, receivers, num_segments=nodes.shape[0])
        n_in = jnp.concatenate([nodes, agg], axis=-1)
        n = self.node_norm(self.node_fc2(jax.nn.relu(self.node_fc1(n_in)))) + nodes
        return n, e


class MeshGraphNet(base.Arch):
    """Encode-process-decode GNN over a static padded graph.

    Input key maps to a tuple (node_feats (N, Fn), edge_feats (E, Fe),
    senders (E,), receivers (E,)). This is the shared processor for
    AMGNet / GraphCastNet-class models.
    """

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        node_in_dim: int,
        edge_in_dim: int,
        out_dim: int,
        hidden: int = 128,
        n_layers: int = 8,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.node_enc = Linear(node_in_dim, hidden, rngs=rngs)
        self.edge_enc = Linear(edge_in_dim, hidden, rngs=rngs)
        self.blocks = [_MPBlock(hidden, rngs=rngs) for _ in range(n_layers)]
        self.decoder = Linear(hidden, out_dim, rngs=rngs)

    def __call__(self, x: Dict) -> Dict[str, jnp.ndarray]:
        node_feats, edge_feats, senders, receivers = x[self.input_keys[0]]
        n = jax.nn.relu(self.node_enc(node_feats))
        e = jax.nn.relu(self.edge_enc(edge_feats))
        for block in self.blocks:
            n, e = block(n, e, senders, receivers)
        return {self.output_keys[0]: self.decoder(n)}


class AMGNet(MeshGraphNet):
    """AMGNet flow-field predictor (reference ppsci/arch/amgnet.py): a graph
    U-Net whose coarse level comes from algebraic-multigrid-style greedy
    aggregation (stand-in for the reference's pyamg RS-coarsening — same
    role, no external dependency, fully static once computed).

    Usage: ``assign, cs, cr = AMGNet.coarsen(senders, receivers, n)`` on the
    host graph, then feed ``(node_feats, edge_feats, senders, receivers,
    assign, cs, cr)``. The 4-tuple input runs the flat processor (backward
    compatible)."""

    def __init__(self, *args, **kwargs):
        rngs = kwargs.get("rngs") or Rngs(0)
        kwargs["rngs"] = rngs
        super().__init__(*args, **kwargs)
        hidden = self.node_enc.out_features
        self.coarse_blocks = [_MPBlock(hidden, rngs=rngs) for _ in range(2)]
        self.coarse_edge_enc = Linear(1, hidden, rngs=rngs)

    @staticmethod
    def coarsen(senders, receivers, n_nodes):
        """Greedy aggregation (AMG-style): unaggregated nodes become seeds
        and absorb their unaggregated neighbors. Returns (assign (N,),
        coarse_senders, coarse_receivers) as numpy int32."""
        import numpy as np

        senders = np.asarray(senders)
        receivers = np.asarray(receivers)
        assign = -np.ones(n_nodes, np.int64)
        # adjacency lists
        order = np.argsort(senders, kind="stable")
        s_sorted, r_sorted = senders[order], receivers[order]
        starts = np.searchsorted(s_sorted, np.arange(n_nodes))
        ends = np.searchsorted(s_sorted, np.arange(n_nodes) + 1)
        n_coarse = 0
        for v in range(n_nodes):
            if assign[v] >= 0:
                continue
            assign[v] = n_coarse
            for u in r_sorted[starts[v]:ends[v]]:
                if assign[u] < 0:
                    assign[u] = n_coarse
            n_coarse += 1
        ce = {(int(assign[s]), int(assign[r]))
              for s, r in zip(senders, receivers) if assign[s] != assign[r]}
        if not ce:
            ce = {(0, 0)}
        ce = np.asarray(sorted(ce), np.int32)
        return assign.astype(np.int32), ce[:, 0], ce[:, 1]

    def __call__(self, x: Dict) -> Dict[str, jnp.ndarray]:
        graph = x[self.input_keys[0]]
        if len(graph) == 4:
            return super().__call__(x)
        node_feats, edge_feats, senders, receivers, assign, cs, cr = graph
        n = jax.nn.relu(self.node_enc(node_feats))
        e = jax.nn.relu(self.edge_enc(edge_feats))
        # fine pre-smoothing
        for block in self.blocks[: len(self.blocks) // 2]:
            n, e = block(n, e, senders, receivers)
        # restrict: mean over aggregates (assign/cs/cr must be STATIC
        # numpy arrays — close over them when jitting the train step)
        n_agg = jax.ops.segment_sum(n, assign, num_segments=int(assign.max()) + 1)
        cnt = jax.ops.segment_sum(jnp.ones((n.shape[0], 1)), assign, num_segments=int(assign.max()) + 1)
        c = n_agg / jnp.clip(cnt, 1.0, None)
        ce = jax.nn.relu(self.coarse_edge_enc(jnp.ones((len(cs), 1))))
        for block in self.coarse_blocks:
            c, ce = block(c, ce, cs, cr)
        # prolong + skip
        n = n + c[assign]
        for block in self.blocks[len(self.blocks) // 2 :]:
            n, e = block(n, e, senders, receivers)
        return {self.output_keys[0]: self.decoder(n)}


def _icosahedron():
    import numpy as np

    phi = (1 + np.sqrt(5)) / 2
    v = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    return v, f


def _refine(verts, faces):
    """Midpoint triangle subdivision on the unit sphere."""
    import numpy as np

    verts = list(map(tuple, verts))
    cache = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            m = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2
            m = tuple(m / np.linalg.norm(m))
            cache[key] = len(verts)
            verts.append(m)
        return cache[key]

    new_faces = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.asarray(verts), np.asarray(new_faces, np.int64)


def build_multimesh(level: int):
    """GraphCast multi-mesh: vertices of the finest icosahedral refinement,
    edge set = UNION of the edges of every refinement level (long edges from
    coarse levels give the processor global receptive field in few hops;
    reference graphcast.py multimesh construction)."""
    import numpy as np

    verts, faces = _icosahedron()
    edge_set = set()

    def add_edges(fs):
        for a, b, c in fs:
            for i, j in ((a, b), (b, c), (c, a)):
                edge_set.add((i, j))
                edge_set.add((j, i))

    add_edges(faces)
    for _ in range(level):
        verts, faces = _refine(verts, faces)
        add_edges(faces)
    edges = np.asarray(sorted(edge_set), np.int32)
    return verts.astype(np.float32), edges[:, 0], edges[:, 1]


def _edge_feats(pos_s, pos_r):
    import numpy as np

    d = pos_r - pos_s
    return np.concatenate([d, np.linalg.norm(d, axis=1, keepdims=True)], 1).astype(np.float32)


class GraphCastNet(base.Arch):
    """GraphCast weather GNN (reference ppsci/arch/graphcast.py):
    grid2mesh encoder -> multi-mesh processor -> mesh2grid decoder.

    With ``lat``/``lon`` given, the icosahedral multi-mesh and the bipartite
    grid<->mesh graphs are generated internally (the reference loads
    precomputed template files — same structure): every grid point encodes
    into its nearest mesh vertex, the processor message-passes over the
    union of all refinement levels' edges, and each grid point decodes from
    its 3 nearest mesh vertices. Without lat/lon it degrades to the flat
    MeshGraphNet contract (single combined graph)."""

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        node_in_dim: int,
        edge_in_dim: int = 4,
        out_dim: int = 8,
        hidden: int = 128,
        n_layers: int = 8,
        lat: Optional[int] = None,
        lon: Optional[int] = None,
        mesh_level: int = 2,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.multimesh = lat is not None and lon is not None
        if not self.multimesh:
            self.flat = MeshGraphNet(input_keys, output_keys, node_in_dim,
                                     edge_in_dim, out_dim, hidden, n_layers, rngs=rngs)
            return

        import numpy as np

        mesh_pos, ms, mr = build_multimesh(mesh_level)
        la = np.linspace(-np.pi / 2, np.pi / 2, lat)
        lo = np.linspace(0, 2 * np.pi, lon, endpoint=False)
        LA, LO = np.meshgrid(la, lo, indexing="ij")
        grid_pos = np.stack([np.cos(LA) * np.cos(LO), np.cos(LA) * np.sin(LO), np.sin(LA)], -1)
        grid_pos = grid_pos.reshape(-1, 3).astype(np.float32)
        ng, nm = len(grid_pos), len(mesh_pos)
        self.n_grid, self.n_mesh = ng, nm

        sim = grid_pos @ mesh_pos.T  # cosine similarity on the sphere
        g2m_r = np.argmax(sim, axis=1)  # nearest mesh vertex per grid point
        m2g_s = np.argsort(-sim, axis=1)[:, :3]  # 3 nearest per grid point

        # combined node indexing: [grid 0..ng) then mesh ng..ng+nm)
        self._g2m = (jnp.asarray(np.arange(ng, dtype=np.int32)),
                     jnp.asarray((ng + g2m_r).astype(np.int32)),
                     jnp.asarray(_edge_feats(grid_pos, mesh_pos[g2m_r])))
        self._mesh = (jnp.asarray((ng + ms).astype(np.int32)),
                      jnp.asarray((ng + mr).astype(np.int32)),
                      jnp.asarray(_edge_feats(mesh_pos[ms], mesh_pos[mr])))
        m2g_snd = (ng + m2g_s.reshape(-1)).astype(np.int32)
        m2g_rcv = np.repeat(np.arange(ng, dtype=np.int32), 3)
        self._m2g = (jnp.asarray(m2g_snd), jnp.asarray(m2g_rcv),
                     jnp.asarray(_edge_feats(mesh_pos[m2g_s.reshape(-1)],
                                             np.repeat(grid_pos, 3, axis=0))))
        self._mesh_feat = jnp.asarray(mesh_pos)

        self.grid_enc = Linear(node_in_dim, hidden, rngs=rngs)
        self.mesh_enc = Linear(3, hidden, rngs=rngs)
        self.e_g2m = Linear(4, hidden, rngs=rngs)
        self.e_mesh = Linear(4, hidden, rngs=rngs)
        self.e_m2g = Linear(4, hidden, rngs=rngs)
        self.g2m_block = _MPBlock(hidden, rngs=rngs)
        self.blocks = [_MPBlock(hidden, rngs=rngs) for _ in range(n_layers)]
        self.m2g_block = _MPBlock(hidden, rngs=rngs)
        self.decoder = Linear(hidden, out_dim, rngs=rngs)

    def __call__(self, x: Dict) -> Dict[str, jnp.ndarray]:
        if not self.multimesh:
            return {self.output_keys[0]:
                    self.flat({self.flat.input_keys[0]: x[self.input_keys[0]]})[self.flat.output_keys[0]]}
        grid_feats = x[self.input_keys[0]]  # (n_grid, F)
        g = jax.nn.relu(self.grid_enc(grid_feats))
        m = jax.nn.relu(self.mesh_enc(self._mesh_feat))
        n = jnp.concatenate([g, m], axis=0)
        # grid2mesh
        s, r, ef = self._g2m
        n, _ = self.g2m_block(n, jax.nn.relu(self.e_g2m(ef)), s, r)
        # multi-mesh processor
        s, r, ef = self._mesh
        e = jax.nn.relu(self.e_mesh(ef))
        for block in self.blocks:
            n, e = block(n, e, s, r)
        # mesh2grid
        s, r, ef = self._m2g
        n, _ = self.m2g_block(n, jax.nn.relu(self.e_m2g(ef)), s, r)
        return {self.output_keys[0]: self.decoder(n[: self.n_grid])}


class CFDGCN(base.Arch):
    """CFD-informed GCN (reference ppsci/arch/cfdgcn.py): a coarse CFD
    solution (reference: SU2 in the training loop) is upsampled and
    concatenated with node features before GCN message passing.

    SU2 is not available in this environment; pass ``cfd_solver`` as any
    callable (coarse_x) -> coarse fields, or feed precomputed coarse
    solutions as part of the node features (the no-solver path below).
    """

    def __init__(
        self,
        input_keys: Tuple[str, ...],
        output_keys: Tuple[str, ...],
        node_in_dim: int,
        edge_in_dim: int,
        out_dim: int,
        hidden: int = 128,
        n_layers: int = 6,
        cfd_solver=None,
        *,
        rngs: Optional[Rngs] = None,
    ):
        super().__init__()
        if rngs is None:
            rngs = Rngs(0)
        self.input_keys = tuple(input_keys)
        self.output_keys = tuple(output_keys)
        self.cfd_solver = cfd_solver
        self.gnn = MeshGraphNet(
            ("graph",), ("pred",), node_in_dim, edge_in_dim, out_dim, hidden, n_layers, rngs=rngs
        )

    def __call__(self, x: Dict) -> Dict[str, jnp.ndarray]:
        node_feats, edge_feats, senders, receivers = x[self.input_keys[0]]
        if self.cfd_solver is not None:
            coarse = self.cfd_solver(node_feats)
            node_feats = jnp.concatenate([node_feats, coarse], axis=-1)
        out = self.gnn({"graph": (node_feats, edge_feats, senders, receivers)})
        return {self.output_keys[0]: out["pred"]}
