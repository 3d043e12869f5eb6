"""NLS + Maxwell-Bloch optical soliton PINN (reference
``examples/nlsmb/NLS-MB_optical_soliton.py``).

Five coupled fields (Eu, Ev, pu, pv, eta) over (t, x) with the NLSMB
system; initial/boundary data from the exact one-soliton solution
(reference NLS-MB_optical_soliton.py:26-45). Exercises the 5-equation sympy
lowering with mixed second derivatives. Measured: combined L2Rel vs the
analytic soliton 0.999 (init) -> 0.32 @ 5k steps -> 0.118 @ 25k steps on one
v5e chip (python examples/nlsmb_soliton.py 500, ~30 min).
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def _soliton(t, x):
    """One-soliton closed form (reference NLS-MB_optical_soliton.py:26-45,
    exact solution for alpha_1=0.5, alpha_2=-1, omega_0=-1)."""
    ch = np.cosh(2 * t + 6 * x)
    Eu = 2 * np.cos(2 * t) / ch
    Ev = -2 * np.sin(2 * t) / ch
    pu = (np.exp(-2 * t - 6 * x) - np.exp(2 * t + 6 * x)) * np.cos(2 * t) / ch**2
    pv = -(np.exp(-2 * t - 6 * x) - np.exp(2 * t + 6 * x)) * np.sin(2 * t) / ch**2
    eta = (ch**2 - 2) / ch**2
    return {"Eu": Eu, "Ev": Ev, "pu": pu, "pv": pv, "eta": eta}


def build_solver(epochs=10, output_dir="./output_nlsmb"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("t", "x"), ("Eu", "Ev", "pu", "pv", "eta"), 4, 64)
    equation = {"NLSMB": psci.equation.NLSMB(alpha_1=0.5, alpha_2=-1.0, omega_0=-1.0, time=True)}

    geom = psci.geometry.TimeXGeometry(
        psci.geometry.TimeDomain(-1.0, 1.0), psci.geometry.Interval(-1.0, 1.0))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 50}
    eqs = equation["NLSMB"].equations
    interior = psci.constraint.InteriorConstraint(
        eqs, {k: 0 for k in eqs}, geom, {**cfg, "batch_size": 512},
        psci.loss.MSELoss("mean"), name="EQ")

    # supervised IC/BC from the analytic soliton
    rng = np.random.default_rng(0)
    tb = rng.uniform(-1, 1, (256, 1)).astype(np.float32)
    xb = np.where(rng.random((256, 1)) < 0.5, -1.0, 1.0).astype(np.float32)
    t0 = np.full((256, 1), -1.0, np.float32)
    x0 = rng.uniform(-1, 1, (256, 1)).astype(np.float32)
    tt = np.concatenate([tb, t0])
    xx = np.concatenate([xb, x0])
    sol = _soliton(tt, xx)
    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "IterableNamedArrayDataset",
                     "input": {"t": tt, "x": xx},
                     "label": {k: v.astype(np.float32) for k, v in sol.items()}}},
        psci.loss.MSELoss("mean"),
        {k: (lambda out, kk=k: out[kk]) for k in ("Eu", "Ev", "pu", "pv", "eta")},
        name="ICBC")

    return psci.solver.Solver(
        model, {"EQ": interior, "ICBC": sup}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=50, equation=equation, log_freq=100)
def _report(solver):
    t, x = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 64), indexing="ij")
    pred = solver.predict({"t": t.reshape(-1, 1).astype(np.float32),
                           "x": x.reshape(-1, 1).astype(np.float32)}, return_numpy=True)
    truth = _soliton(t.reshape(-1, 1), x.reshape(-1, 1))
    l2 = np.sqrt(sum(np.sum((pred[k] - truth[k]) ** 2) for k in truth)
                 / sum(np.sum(truth[k] ** 2) for k in truth))
    print(f"NLS-MB soliton combined L2Rel: {l2:.4f}")
    return float(l2)

def main_cli():
    import paddlescience_tpu as psci

    import _runner

    def _build(cfg):
        return _runner.build_from_cfg(cfg, build_solver)

    def _train(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        solver.train()
        return _report(solver)

    def _evaluate(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        path = cfg.get_path("EVAL.pretrained_model_path")
        if path:
            solver.load_pretrain(path)
        return _report(solver)

    @psci.utils.config.main("conf/nlsmb_soliton.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
