"""Loss + metric + aggregator semantics (reference test/loss/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlescience_tpu as psci
from paddlescience_tpu.loss import mtl


def test_mse():
    o = {"u": jnp.asarray([[1.0], [2.0]])}
    l = {"u": jnp.asarray([[0.0], [0.0]])}
    out = psci.loss.MSELoss("mean")(o, l)
    np.testing.assert_allclose(float(out["u"]), 2.5)
    out = psci.loss.MSELoss("sum", weight=2.0)(o, l)
    np.testing.assert_allclose(float(out["u"]), 10.0)


def test_mse_weight_dict_and_area():
    o = {"u": jnp.ones((4, 1)), "area": jnp.full((4, 1), 0.5)}
    l = {"u": jnp.zeros((4, 1))}
    w = {"u": jnp.full((4, 1), 3.0)}
    out = psci.loss.MSELoss("sum")(o, l, w)
    np.testing.assert_allclose(float(out["u"]), 4 * 1 * 3 * 0.5)


def test_causal_mse_matches_reference_doctest():
    """Reference mse.py doctest: output/label pair -> 0.96841478."""
    o = {"u": jnp.asarray([[0.5, 0.9, 1.0], [1.1, -1.3, 0.0]])}
    l = {"u": jnp.asarray([[-1.8, 1.0, -0.1], [-0.2, 2.5, 2.0]])}
    loss = psci.loss.CausalMSELoss(n_chunks=3)(o, l)
    np.testing.assert_allclose(float(loss["u"]), 0.96841478, rtol=1e-5)


def test_l2rel_and_metrics():
    o = {"u": jnp.asarray([[3.0, 4.0]])}
    l = {"u": jnp.asarray([[0.0, 0.0]])}
    with np.errstate(all="ignore"):
        m = psci.metric.L2Rel()(o, l)
    assert np.isfinite(float(m["u"]))  # guarded denominator

    l2 = {"u": jnp.asarray([[1.0, 0.0]])}
    m = psci.metric.L2Rel()(o, l2)
    np.testing.assert_allclose(float(m["u"]), np.sqrt(4 + 16) / 1.0, rtol=1e-5)

    rmse = psci.metric.RMSE()({"u": jnp.asarray([1.0, 3.0])}, {"u": jnp.asarray([0.0, 0.0])})
    np.testing.assert_allclose(float(rmse["u"]), np.sqrt(5.0), rtol=1e-6)


def test_aggregator_sum():
    agg = mtl.Sum()
    total, state = agg.aggregate([jnp.asarray(1.0), jnp.asarray(2.0)], agg.init_state(), 0)
    np.testing.assert_allclose(float(total), 3.0)


def test_gradnorm_weights_update():
    agg = mtl.GradNorm(num_losses=2, update_freq=1, momentum=0.0)
    state = agg.init_state()
    losses = [jnp.asarray(1.0), jnp.asarray(2.0)]
    grad_norms = jnp.asarray([1.0, 3.0])
    total, state = agg.aggregate(losses, state, jnp.asarray(0), grad_norms=grad_norms)
    # weights = mean(gn)/gn = [2.0, 2/3]
    np.testing.assert_allclose(np.asarray(state["weight"]), [2.0, 2 / 3], rtol=1e-6)
    np.testing.assert_allclose(float(total), 2.0 * 1 + 2 / 3 * 2, rtol=1e-6)


def test_relobralo_state_evolution():
    agg = mtl.Relobralo(num_losses=2)
    state = agg.init_state()
    key = jax.random.PRNGKey(0)
    l0 = [jnp.asarray(1.0), jnp.asarray(4.0)]
    total, state = agg.aggregate(l0, state, jnp.asarray(0), key=key)
    np.testing.assert_allclose(float(total), 5.0)  # step 0: plain sum
    total, state = agg.aggregate(l0, state, jnp.asarray(1), key=key)
    assert np.isfinite(float(total))
    assert state["lmbda"].shape == (2,)


def test_pcgrad_resolves_conflict():
    agg = mtl.PCGrad(num_losses=2)
    g1 = {"w": jnp.asarray([1.0, 0.0])}
    g2 = {"w": jnp.asarray([-1.0, 1.0])}
    merged, _ = agg.transform_grads([g1, g2], {}, None)
    # g1.g2 = -1 < 0: conflict removed; merged must not equal plain sum
    plain = np.asarray(g1["w"] + g2["w"])
    assert not np.allclose(np.asarray(merged["w"]), plain)


def test_chamfer_zero_for_identical():
    pts = jnp.asarray(np.random.rand(2, 8, 3).astype(np.float32))
    out = psci.loss.ChamferLoss()({"p": pts}, {"p": pts})
    np.testing.assert_allclose(float(out["p"]), 0.0, atol=1e-6)


def test_periodic_l2():
    o = {"u": jnp.concatenate([jnp.ones((4, 2)), jnp.ones((4, 2))], 0)}
    out = psci.loss.PeriodicL2Loss()(o, {"u": jnp.zeros((8, 2))})
    np.testing.assert_allclose(float(out["u"]), 0.0, atol=1e-7)
