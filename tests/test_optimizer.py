"""LR schedules + optimizer factories (reference lr semantics)."""

import jax.numpy as jnp
import numpy as np

import paddlescience_tpu as psci

lrs = psci.optimizer.lr_scheduler


def test_exponential_decay():
    sched = lrs.ExponentialDecay(epochs=10, iters_per_epoch=100, learning_rate=1e-3, gamma=0.9, decay_steps=200)()
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 1e-3 * 0.9, rtol=1e-5)
    np.testing.assert_allclose(float(sched(400)), 1e-3 * 0.81, rtol=1e-5)


def test_cosine_with_warmup():
    sched = lrs.Cosine(epochs=10, iters_per_epoch=10, learning_rate=1.0, warmup_epoch=2, warmup_start_lr=0.0)()
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(sched(10)), 0.5, rtol=1e-5)  # halfway warmup
    np.testing.assert_allclose(float(sched(20)), 1.0, rtol=1e-5)  # warmup done
    assert float(sched(99)) < 0.01  # decayed near the end


def test_step_and_multistep():
    s = lrs.Step(epochs=10, iters_per_epoch=1, learning_rate=1.0, step_size=3, gamma=0.1)()
    np.testing.assert_allclose([float(s(i)) for i in (0, 2, 3, 6)], [1.0, 1.0, 0.1, 0.01], rtol=1e-6)
    m = lrs.MultiStepDecay(epochs=10, iters_per_epoch=1, learning_rate=1.0, milestones=[2, 5])()
    np.testing.assert_allclose([float(m(i)) for i in (0, 2, 5)], [1.0, 0.1, 0.01], rtol=1e-6)


def test_piecewise():
    p = lrs.Piecewise(iters_per_epoch=1, decay_epochs=[3, 6], values=[1.0, 0.5, 0.25])()
    np.testing.assert_allclose([float(p(i)) for i in (0, 3, 7)], [1.0, 0.5, 0.25], rtol=1e-6)


def test_onecycle_shape():
    o = lrs.OneCycleLR(epochs=1, iters_per_epoch=100, max_learning_rate=1.0)()
    lrs_seq = [float(o(i)) for i in range(0, 100, 10)]
    assert max(lrs_seq) <= 1.0 + 1e-6
    assert lrs_seq[3] > lrs_seq[0]  # ramp up
    assert lrs_seq[-1] < lrs_seq[3]  # anneal down


def test_optimizer_factories():
    import optax

    model = psci.arch.MLP(("x",), ("u",), 2, 8)
    for factory in (
        psci.optimizer.Adam(1e-3),
        psci.optimizer.AdamW(1e-3),
        psci.optimizer.SGD(1e-3),
        psci.optimizer.Momentum(1e-3, 0.9),
        psci.optimizer.RMSProp(1e-3),
    ):
        opt = factory(model)
        state = opt.init(model.param_tree())
        assert state is not None


def test_grad_clip():
    opt = psci.optimizer.Adam(1e-3, grad_clip={"name": "global_norm", "clip_norm": 1.0})(None)
    assert opt.tx is not None


def test_build_optimizer():
    model = psci.arch.MLP(("x",), ("u",), 2, 8)
    opt = psci.optimizer.build_optimizer(
        {"name": "Adam", "lr_scheduler": {"name": "ExponentialDecay", "learning_rate": 1e-3, "gamma": 0.9, "decay_steps": 100}},
        model,
        epochs=10,
        iters_per_epoch=10,
    )
    np.testing.assert_allclose(float(opt.lr_fn(0)), 1e-3, rtol=1e-6)


def test_cosine_warm_restarts():
    # reference semantics (lr_scheduler.py:641-643): with by_epoch=False,
    # T_0 counts epochs and is scaled to T_0 * iters_per_epoch steps
    sched = lrs.CosineWarmRestarts(
        epochs=10, iters_per_epoch=10, learning_rate=1.0, T_0=2)()  # restart every 20 steps
    np.testing.assert_allclose(float(sched(0)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(sched(20)), 1.0, rtol=1e-5)   # restart
    np.testing.assert_allclose(float(sched(10)), 0.5, rtol=1e-5)   # trough midpoint
    np.testing.assert_allclose(float(sched(30)), 0.5, rtol=1e-5)
    # T_mult=2: periods grow 20, 40, 80... restarts at 20, 60
    sched2 = lrs.CosineWarmRestarts(
        epochs=20, iters_per_epoch=10, learning_rate=1.0, T_0=2, T_mult=2)()
    np.testing.assert_allclose(float(sched2(60)), 1.0, rtol=1e-4)
    assert float(sched2(59)) < 0.05  # end of the 40-step period
    # reference-name alias (lr_scheduler.py:523)
    assert lrs.CosineAnnealingWarmRestarts is lrs.CosineWarmRestarts
