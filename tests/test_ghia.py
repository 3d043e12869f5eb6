"""Ghia et al. (1982) benchmark tables (utils/ghia.py) — integrity + the
profile-RMSE helper used by the LDC examples' distribution-independent
cross-check (VERDICT r3 item 5)."""

import numpy as np
import pytest

from paddlescience_tpu.utils import ghia


def test_table_integrity():
    for Re in (100, 1000):
        t = ghia.profiles(Re)
        # boundary conditions: no-slip bottom, lid u=1 at y=1; v=0 at side walls
        assert t["u"][0] == 0.0 and t["u"][-1] == 1.0
        assert t["v"][0] == 0.0 and t["v"][-1] == 0.0
        assert np.all(np.diff(t["y"]) > 0) and np.all(np.diff(t["x"]) > 0)
        assert t["y"][8] == 0.5 and t["x"][8] == 0.5
        # center values (geometric center) from the paper
    np.testing.assert_allclose(ghia.profiles(100)["u"][8], -0.20581)
    np.testing.assert_allclose(ghia.profiles(1000)["u"][8], -0.06080)
    with pytest.raises(KeyError):
        ghia.profiles(400)  # only verified tables are embedded


def test_profile_rmse_exact_field_scores_zero():
    t = ghia.profiles(100)
    u_i = lambda y: np.interp(y, t["y"], t["u"])
    v_i = lambda x: np.interp(x, t["x"], t["v"])

    def uv_fn(x, y):
        if np.allclose(x, 0.5):  # u-profile query
            return {"u": u_i(y), "v": np.zeros_like(y)}
        return {"u": np.zeros_like(x), "v": v_i(x)}

    r = ghia.profile_rmse(uv_fn, 100)
    assert r["ghia_u_rmse"] < 1e-12 and r["ghia_v_rmse"] < 1e-12
    # lid exclusion: points above clip dropped from the u-profile
    assert r["n_u"] == (ghia.profiles(100)["y"] <= 0.95).sum()
    assert r["n_v"] == 17


def test_profile_rmse_detects_error():
    def uv_fn(x, y):
        return {"u": np.full_like(y, 0.3), "v": np.full_like(x, -0.2)}

    r = ghia.profile_rmse(uv_fn, 1000)
    assert r["ghia_u_rmse"] > 0.1 and r["ghia_v_rmse"] > 0.1
