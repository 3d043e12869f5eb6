"""Regression tests for ADVICE r1 findings + VERDICT r1 weak-spot fixes."""

import numpy as np
import pytest

import paddlescience_tpu as psci
from paddlescience_tpu.data import BatchLoader, NamedArrayDataset
from paddlescience_tpu.geometry import Mesh, TimeDomain, TimeXGeometry
from paddlescience_tpu.parallel import mesh as mesh_mod


def _unit_tetra():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int64)
    return Mesh((verts, faces))


def test_timex_mesh_boundary_sampling():
    """ADVICE r1 #1: TimeXGeometry over a Mesh must return aligned
    (points, normals, areas) and sample_boundary must not raise."""
    geom = TimeXGeometry(TimeDomain(0.0, 1.0, time_step=0.25), _unit_tetra())
    out = geom.sample_boundary(64)
    assert out["t"].shape == (64, 1)
    for k in ("x", "y", "z", "normal_x", "normal_y", "normal_z", "area"):
        assert out[k].shape == (64, 1), k
    # normals are unit-length
    n = np.hstack([out["normal_x"], out["normal_y"], out["normal_z"]])
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # continuous-time branch too
    geom2 = TimeXGeometry(TimeDomain(0.0, 1.0), _unit_tetra())
    out2 = geom2.sample_boundary(32)
    assert out2["area"].shape == (32, 1)


def test_timex_mesh_boundary_criteria_alignment():
    """Criteria filtering must keep normals aligned with points."""
    geom = TimeXGeometry(TimeDomain(0.0, 1.0, time_step=0.5), _unit_tetra())
    # keep only the z=0 face: its outward normal is (0, 0, -1)
    out = geom.sample_boundary(40, criteria=lambda t, x, y, z: (z < 1e-6).flatten())
    np.testing.assert_allclose(out["normal_z"], -1.0, atol=1e-4)
    assert np.all(out["z"] < 1e-5)


def test_warmup_rebases_decay_clock():
    """ADVICE r1 #2: base schedules must see schedule-time rebased to 0 at
    warmup end (the reference's LinearWarmup semantics)."""
    import jax.numpy as jnp

    sched = psci.optimizer.lr_scheduler.Linear(
        epochs=10, iters_per_epoch=10, learning_rate=1.0, end_lr=0.0,
        warmup_epoch=2, warmup_start_lr=0.0)()
    # warmup_steps = 20; at step 20 LR must be the *undecayed* base LR
    assert float(sched(jnp.asarray(20))) == pytest.approx(1.0, abs=1e-6)
    # mid-warmup: linear ramp
    assert float(sched(jnp.asarray(10))) == pytest.approx(0.5, abs=1e-6)
    # decay window = (epochs - warmup)*ipe = 80 rebased steps: midpoint of the
    # decay (raw step 60 -> rebased 40/80) must be exactly half — the
    # un-rebased bug gave 60/80 here
    assert float(sched(jnp.asarray(60))) == pytest.approx(0.5, abs=1e-6)
    assert float(sched(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)

    # step_size is in epochs (reference semantics): 5 epochs = 50 iters
    step_sched = psci.optimizer.lr_scheduler.Step(
        epochs=10, iters_per_epoch=10, learning_rate=1.0, step_size=5,
        gamma=0.1, warmup_epoch=1)()
    # first decay happens 50 iters AFTER the 10-iter warmup (iter 60), not at 50
    assert float(step_sched(jnp.asarray(55))) == pytest.approx(1.0, abs=1e-6)
    assert float(step_sched(jnp.asarray(61))) == pytest.approx(0.1, abs=1e-6)


def test_cosine_warmup_unchanged():
    import jax.numpy as jnp

    sched = psci.optimizer.lr_scheduler.Cosine(
        epochs=10, iters_per_epoch=10, learning_rate=1.0, warmup_epoch=2)()
    assert float(sched(jnp.asarray(20))) == pytest.approx(1.0, abs=1e-6)
    # full cosine decay completes at warmup + T_max = 20 + 80
    assert float(sched(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)


def test_batchloader_ranks_partition():
    """ADVICE r1 #3: rank-strided shards must partition the dataset (same
    permutation on every rank)."""
    ds = NamedArrayDataset({"x": np.arange(16, dtype=np.float32).reshape(16, 1)})
    seen = []
    for rank in range(4):
        loader = BatchLoader(ds, batch_size=4, shuffle=True,
                             num_replicas=4, rank=rank, seed=7)
        inp, _, _ = next(iter(loader))
        seen.append(inp["x"].flatten())
    all_vals = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(all_vals, np.arange(16, dtype=np.float32))


def test_jacobian_i0_single_column():
    """ADVICE r1 #4: jacobian(..., i=0) on a multi-column output returns one
    column, same as i>0."""
    import jax.numpy as jnp

    model = psci.arch.MLP(("x", "y"), ("u", "v"), num_layers=2, hidden_size=8)
    x = jnp.linspace(0.0, 1.0, 5).reshape(-1, 1)
    y = jnp.linspace(0.0, 1.0, 5).reshape(-1, 1)

    def fn(inp):
        out = model.forward_with_tape(inp)
        from paddlescience_tpu.autodiff import jacobian
        uv = out["__tape__"]["uv"] if "uv" in out.get("__tape__", {}) else None
        return out

    from paddlescience_tpu.utils import expression

    exprs = {
        "du0": lambda out: psci.autodiff.jacobian(out["u"], out["x"], i=0),
        "du1": lambda out: psci.autodiff.jacobian(out["v"], out["x"], i=0),
    }
    res = expression.evaluate_expressions([model], {"x": x, "y": y}, exprs)
    assert np.asarray(res["du0"]).shape == (5, 1)
    assert np.asarray(res["du1"]).shape == (5, 1)


def test_shard_batch_raises_on_indivisible():
    """VERDICT r1 weak #2: indivisible large batches raise, never silently
    replicate; small (weight-like) arrays still replicate."""
    m = mesh_mod.get_default_mesh()
    n_data = m.shape["data"]
    if n_data == 1:
        pytest.skip("single-device mesh divides everything")
    bad = {"x": np.zeros((n_data * 4 - 1, 2), np.float32)}
    with pytest.raises(ValueError, match="does not divide"):
        mesh_mod.shard_batch(bad, m)
    # explicit opt-in works
    mesh_mod.shard_batch(bad, m, allow_replicate=True)
    # sub-axis-size arrays replicate silently (legit: per-key weights)
    mesh_mod.shard_batch({"w": np.zeros((1, 1), np.float32)}, m)


def test_resume_uses_last_epoch(tmp_path):
    """VERDICT r1 weak #5: resuming from a checkpoint whose best epoch != last
    epoch must continue from the LAST epoch."""
    from paddlescience_tpu.utils import save_load

    def make_solver(out_dir, **kw):
        # fresh model per Solver: training donates the initial state buffers
        model = psci.arch.MLP(("x",), ("u",), num_layers=2, hidden_size=8)
        sup = psci.constraint.SupervisedConstraint(
            {"dataset": {"name": "IterableNamedArrayDataset",
                         "input": {"x": np.random.rand(8, 1).astype(np.float32)},
                         "label": {"u": np.zeros((8, 1), np.float32)}}},
            psci.loss.MSELoss(), {"u": lambda out: out["u"]}, name="Sup")
        return psci.solver.Solver(
            model, {"Sup": sup}, str(tmp_path / out_dir),
            psci.optimizer.Adam(1e-3)(model), epochs=3, iters_per_epoch=1, **kw)

    solver = make_solver("out")
    solver.train()
    # simulate: best metric at epoch 1, trained through epoch 3
    save_load.save_checkpoint(solver.state, str(tmp_path / "out"), "best_model",
                              metric={"metric": 0.5, "epoch": 1, "last_epoch": 3})

    solver2 = make_solver(
        "out2", checkpoint_path=str(tmp_path / "out" / "checkpoints" / "best_model"))
    assert solver2.last_epoch == 3
    assert solver2.best_metric["epoch"] == 1
    # legacy checkpoints without last_epoch fall back to best epoch
    save_load.save_checkpoint(solver.state, str(tmp_path / "out"), "legacy",
                              metric={"metric": 0.5, "epoch": 2})
    solver3 = make_solver(
        "out3", checkpoint_path=str(tmp_path / "out" / "checkpoints" / "legacy"))
    assert solver3.last_epoch == 2


def test_load_pretrain_validates_structure(tmp_path):
    """ADVICE r1 #5: load_pretrain(path, params_like) validates against the
    model's structure and never leaks '_metric'."""
    from paddlescience_tpu.utils import save_load

    model = psci.arch.MLP(("x",), ("u",), num_layers=2, hidden_size=8)
    params = model.param_tree()
    save_load.save_checkpoint({"params": params}, str(tmp_path), "ck",
                              metric={"metric": 1.0, "epoch": 1})
    loaded = save_load.load_pretrain(
        str(tmp_path / "checkpoints" / "ck"), params)
    assert "_metric" not in loaded
    import jax
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
