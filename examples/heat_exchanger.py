"""1-D heat exchanger three-temperature system (reference
``examples/heat_exchanger/heat_exchanger.py``).

T_h, T_c, T_w over (x, t, qm) with the HeatExchanger PDE system, hot/cold
inlet BCs and initial conditions. The model takes (x, t, qm_h, qm_c) and
predicts the three temperature fields (reference uses HEDeepONets; this
compact case uses an MLP — the HEDeepONets arch is available in psci.arch).
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def build_solver(epochs=30, iters_per_epoch=20, output_dir="./output_heat_exchanger"):
    psci.utils.set_random_seed(42)
    alpha_h, alpha_c, v_h, v_c, w_h, w_c = 1.0, 1.0, 1.0, 1.0, 1.0, 1.0
    L, T_END = 1.0, 1.0

    model = psci.arch.MLP(("x", "t", "qm_h", "qm_c"), ("T_h", "T_c", "T_w"), 4, 50)
    equation = {"heat": psci.equation.HeatExchanger(alpha_h, alpha_c, v_h, v_c, w_h, w_c)}

    def sample(n, t_zero=False, x_edge=None, seed_shift=0):
        rng = np.random.default_rng(0 + seed_shift)
        x = rng.uniform(0, L, (n, 1)).astype(np.float32)
        t = np.zeros((n, 1), np.float32) if t_zero else rng.uniform(0, T_END, (n, 1)).astype(np.float32)
        if x_edge is not None:
            x = np.full((n, 1), x_edge, np.float32)
        qm = rng.uniform(0.5, 1.5, (n, 2)).astype(np.float32)
        return {"x": x, "t": t, "qm_h": qm[:, :1], "qm_c": qm[:, 1:]}

    cfg = {"dataset": "IterableNamedArrayDataset"}
    inter = sample(2048)
    pde = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset", "input": inter,
                     "label": {k: np.zeros((2048, 1), np.float32) for k in equation["heat"].equations}}},
        psci.loss.MSELoss("mean"),
        equation["heat"].equations,
        name="EQ",
    )
    # hot inlet at x=0: T_h = 1; cold inlet at x=L: T_c = 0
    bc_h_in = sample(256, x_edge=0.0, seed_shift=1)
    bc_h = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset", "input": bc_h_in,
                     "label": {"T_h": np.ones((256, 1), np.float32)}}},
        psci.loss.MSELoss("mean"),
        {"T_h": lambda out: out["T_h"]},
        name="BC_hot",
    )
    bc_c_in = sample(256, x_edge=L, seed_shift=2)
    bc_c = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset", "input": bc_c_in,
                     "label": {"T_c": np.zeros((256, 1), np.float32)}}},
        psci.loss.MSELoss("mean"),
        {"T_c": lambda out: out["T_c"]},
        name="BC_cold",
    )
    ic_in = sample(512, t_zero=True, seed_shift=3)
    ic = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset", "input": ic_in,
                     "label": {"T_h": 0.5 * np.ones((512, 1), np.float32),
                               "T_c": 0.5 * np.ones((512, 1), np.float32),
                               "T_w": 0.5 * np.ones((512, 1), np.float32)}}},
        psci.loss.MSELoss("mean"),
        {k: (lambda out, kk=k: out[kk]) for k in ("T_h", "T_c", "T_w")},
        name="IC",
    )

    constraint = {c.name: c for c in (pde, bc_h, bc_c, ic)}
    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        equation=equation,
        log_freq=100,
    )
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/heat_exchanger.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
