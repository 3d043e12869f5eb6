"""Measured derivative-path selection (solver/autotune.py, autodiff/path.py).

The r3 north-star regression shipped because path selection was structural;
these tests pin the override/default resolution order, candidate discovery,
and the end-to-end autotune flow (timing + disk cache + correct training
afterwards) on the CPU backend.
"""

import json
import os

import jax
import numpy as np
import pytest

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import path as deriv_path
from paddlescience_tpu.solver import autotune as autotune_mod


@pytest.fixture(autouse=True)
def _clean_default():
    yield
    deriv_path.set_default(None)


def test_flag_resolution_order(monkeypatch):
    monkeypatch.setenv("PSCI_JET", "0")
    assert deriv_path.flag("PSCI_JET", "1") == "0"  # env beats built-in
    deriv_path.set_default({"PSCI_JET": "1"})
    assert deriv_path.flag("PSCI_JET", "1") == "1"  # default beats env
    with deriv_path.override({"PSCI_JET": "0"}):
        assert deriv_path.flag("PSCI_JET", "1") == "0"  # override beats all
    assert deriv_path.flag("PSCI_JET", "1") == "1"
    deriv_path.set_default(None)
    assert deriv_path.flag("PSCI_JET", "1") == "0"


def _tiny_solver(batch=64, iters=4, epochs=1):
    import jax.numpy as jnp

    from paddlescience_tpu.constraint.base import Constraint
    from paddlescience_tpu.data import DeviceSampledDataset

    psci.utils.set_random_seed(0)
    model = psci.arch.MLP(("t", "x"), ("u",), 2, 16)
    eq = psci.equation.AllenCahn(eps=0.01)

    def sample_fn(key):
        kt, kx = jax.random.split(key)
        t = jax.random.uniform(kt, (batch, 1))
        x = jax.random.uniform(kx, (batch, 1), minval=-1.0, maxval=1.0)
        return {"t": t, "x": x}, {"allen_cahn": jnp.zeros((batch, 1))}, {}

    pde = Constraint(DeviceSampledDataset(sample_fn), None, psci.loss.MSELoss("mean"), "PDE")
    pde.output_expr = eq.equations
    solver = psci.solver.Solver(
        model, {"PDE": pde}, None, psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=iters, log_freq=10**9,
    )
    return solver


def test_candidate_names_cpu():
    solver = _tiny_solver()
    names = autotune_mod.candidate_names(solver)
    assert names[0] == "jvp"
    assert "jet" in names  # MLP supports the jet fast path
    # Pallas lowering is unavailable on the CPU backend (unless interpret
    # is forced), so the jet_pallas candidate must not be offered
    if os.environ.get("PSCI_JET_PALLAS_INTERPRET", "0") != "1":
        assert "jet_pallas" not in names


def test_autotune_picks_and_caches(tmp_path, monkeypatch):
    cache_file = tmp_path / "autotune.json"
    monkeypatch.setenv("PSCI_AUTOTUNE_CACHE", str(cache_file))
    monkeypatch.setenv("PSCI_AUTOTUNE_FUSED", "2")
    monkeypatch.setenv("PSCI_AUTOTUNE_CALLS", "1")

    solver = _tiny_solver()
    host_batches = {}
    winner = autotune_mod.autotune(solver, host_batches, fused=2)
    assert winner in ("jvp", "jet")
    assert deriv_path.get_default() == deriv_path.CANDIDATES[winner]

    saved = json.loads(cache_file.read_text())
    (entry,) = saved.values()
    assert entry["winner"] == winner
    assert set(entry["timings_ms_per_step"]) == {"jvp", "jet"}

    # second run must hit the cache (no new timings recorded)
    deriv_path.set_default(None)
    solver2 = _tiny_solver()
    winner2 = autotune_mod.autotune(solver2, host_batches, fused=2)
    assert winner2 == winner
    assert json.loads(cache_file.read_text()) == saved


def test_training_correct_after_autotune(tmp_path, monkeypatch):
    """Losses after a forced-winner autotune match an untuned run exactly
    (same PRNG stream, both paths numerically equivalent)."""
    monkeypatch.setenv("PSCI_AUTOTUNE_CACHE", str(tmp_path / "c.json"))
    monkeypatch.setenv("PSCI_AUTOTUNE_FUSED", "1")
    monkeypatch.setenv("PSCI_AUTOTUNE_CALLS", "1")

    monkeypatch.setenv("PSCI_AUTOTUNE", "0")
    s_plain = _tiny_solver(iters=4)
    s_plain.train()
    probe = {"t": np.full((8, 1), 0.3, np.float32), "x": np.linspace(-1, 1, 8, dtype=np.float32).reshape(-1, 1)}
    u_plain = np.asarray(s_plain.model(jax.tree.map(np.asarray, probe))["u"])

    monkeypatch.setenv("PSCI_AUTOTUNE", "1")
    s_tuned = _tiny_solver(iters=4)
    s_tuned.train()
    u_tuned = np.asarray(s_tuned.model(jax.tree.map(np.asarray, probe))["u"])
    np.testing.assert_allclose(u_tuned, u_plain, rtol=2e-4, atol=1e-6)


def test_signature_changes_with_kernel_source(tmp_path, monkeypatch):
    """Kernel-source changes must invalidate cached winners (VERDICT r4 weak
    #6): the signature hashes the jet/jet_pallas/path module sources, so a
    different source hash yields a different cache key."""
    solver = _tiny_solver()
    sig1 = autotune_mod.signature(solver, {})
    orig = autotune_mod._source_version
    monkeypatch.setattr(autotune_mod, "_source_version", lambda: "deadbeef0badcafe")
    sig2 = autotune_mod.signature(solver, {})
    monkeypatch.setattr(autotune_mod, "_source_version", orig)
    assert sig1 != sig2
    assert autotune_mod.signature(solver, {}) == sig1  # deterministic


def test_maybe_autotune_gated_multiprocess(monkeypatch):
    """Multi-host ranks must not race local-stopwatch decisions (ADVICE r4
    medium): maybe_autotune is a no-op when process_count > 1."""
    monkeypatch.setenv("PSCI_AUTOTUNE", "1")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    solver = _tiny_solver()
    assert autotune_mod.maybe_autotune(solver, {}, fused=2) is None
    assert not deriv_path.get_default()  # no winner installed
