"""Tests for the pure-pytree module system (nn/core.py, nn/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlescience_tpu import nn


def test_param_tree_and_apply():
    lin = nn.Linear(3, 4, rngs=nn.Rngs(0))
    params = lin.param_tree()
    assert set(params) == {"weight", "bias"}
    x = jnp.ones((5, 3))
    y0 = lin(x)  # unbound: uses stored params
    y1 = lin.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))


def test_bind_overlay_is_pure():
    lin = nn.Linear(2, 2, rngs=nn.Rngs(0))
    params = lin.param_tree()
    zeros = jax.tree.map(jnp.zeros_like, params)
    x = jnp.ones((1, 2))
    y_zero = lin.apply(zeros, x)
    np.testing.assert_allclose(np.asarray(y_zero), 0.0)
    # stored params unchanged
    assert float(jnp.abs(lin.weight).sum()) > 0


def test_grad_through_apply():
    lin = nn.Linear(2, 1, rngs=nn.Rngs(0))
    params = lin.param_tree()
    x = jnp.ones((4, 2))

    def loss(p):
        return jnp.sum(lin.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert g["weight"].shape == (2, 1)
    assert float(jnp.abs(g["weight"]).sum()) > 0


def test_nested_modules_and_lists():
    class Net(nn.Module):
        def __init__(self, rngs):
            self.layers = [nn.Linear(2, 2, rngs=rngs) for _ in range(3)]
            self.out = nn.Linear(2, 1, rngs=rngs)

        def __call__(self, x):
            for l in self.layers:
                x = jnp.tanh(l(x))
            return self.out(x)

    net = Net(nn.Rngs(0))
    params = net.param_tree()
    assert "layers" in params and "0" in params["layers"]
    y = net.apply(params, jnp.ones((2, 2)))
    assert y.shape == (2, 1)


def test_buffers_not_in_params():
    class M(nn.Module):
        def __init__(self):
            self.w = nn.Param(jnp.ones(3))
            self.stat = nn.Buffer(jnp.zeros(3))

        def __call__(self):
            return self.w + self.stat

    m = M()
    assert "stat" not in m.param_tree()
    assert "stat" in m.buffer_tree()


def test_conv_shapes():
    conv = nn.Conv(3, 8, kernel_size=(3, 3), rngs=nn.Rngs(0))
    y = conv(jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 16, 16, 8)
    y2 = conv(jnp.ones((16, 16, 3)))
    assert y2.shape == (16, 16, 8)


def test_layernorm():
    ln = nn.LayerNorm(8)
    y = ln(jnp.arange(16, dtype=jnp.float32).reshape(2, 8))
    np.testing.assert_allclose(np.asarray(jnp.mean(y, -1)), 0.0, atol=1e-5)


def test_hessian_under_grad_compiles_fast():
    """The regression that killed flax in this stack: vmap∘jacfwd∘jacfwd
    under value_and_grad must lower+compile quickly."""
    import time

    from paddlescience_tpu import arch

    model = arch.MLP(("x", "y"), ("u",), 4, 16)
    params = model.param_tree()
    xs = {
        "x": jnp.ones((8, 1)),
        "y": jnp.ones((8, 1)),
    }

    def loss(p):
        def pw(xv):
            out = model.apply(p, {"x": xv[0:1], "y": xv[1:2]})
            return out["u"]

        x = jnp.concatenate([xs["x"], xs["y"]], -1)
        H = jax.vmap(jax.jacfwd(jax.jacfwd(pw)))(x)
        return jnp.sum((H[:, 0, 0, 0] + H[:, 0, 1, 1]) ** 2)

    t0 = time.time()
    v, g = jax.jit(jax.value_and_grad(loss)).lower(params).compile()(params)
    elapsed = time.time() - t0
    assert jnp.isfinite(v)
    assert elapsed < 30, f"hessian-under-grad compile too slow: {elapsed:.1f}s"


def test_sequential_no_param_duplication():
    # regression: Sequential once registered layers twice (auto-wrapped
    # _layers list + explicit seq{i} children), doubling every param
    import paddlescience_tpu.nn as nn

    rngs = nn.Rngs(0)
    seq = nn.Sequential(nn.Linear(3, 4, rngs=rngs), nn.Lambda(jnp.tanh), nn.Linear(4, 2, rngs=rngs))
    n = seq.num_params
    assert n == (3 * 4 + 4) + (4 * 2 + 2), n
    tree = seq.param_tree()
    assert set(tree) == {"seq0", "seq2"}, set(tree)  # seq1 = paramless Lambda


def test_setattr_kind_transition():
    # reassigning a Param name as Buffer (or plain attr) must not leave a
    # stale entry behind in the old registry
    import paddlescience_tpu.nn as nn

    class M(nn.Module):
        def __init__(self):
            self.w = nn.Param(jnp.ones((2,)))

    m = M()
    assert "w" in m.param_tree()
    m.w = nn.Buffer(jnp.zeros((2,)))
    assert "w" not in m.param_tree() and "w" in m.buffer_tree()
    m.w = 3.0  # plain python attr
    assert "w" not in m.buffer_tree() and m.w == 3.0


def test_moduledict_reassign_no_dup_keys():
    import paddlescience_tpu.nn as nn

    rngs = nn.Rngs(0)
    d = nn.ModuleDict({"a": nn.Linear(2, 2, rngs=rngs)})
    d["a"] = nn.Linear(2, 3, rngs=rngs)
    assert list(d) == ["a"]
    assert len(d.items()) == 1
