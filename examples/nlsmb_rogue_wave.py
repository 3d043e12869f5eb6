"""NLS + Maxwell-Bloch optical rogue wave PINN (reference
``examples/NLS-MB/NLS-MB_optical_rogue_wave.py``).

Same 5-field NLSMB system as ``nlsmb_soliton.py`` but supervised against
the rational rogue-wave solution (reference rogue_wave.py:26-60), which is
localized in both t and x — the hardest of the reference's three NLS-MB
cases. Short runs validate direction; convergence needs ~50k steps.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def _rogue(t, x):
    """Rational rogue-wave solution (reference rogue_wave.py:26-60)."""
    I = 1j
    den = 1565 * x**2 - 76 * x * t + 68 * t**2 + 17
    E = ((-1565 * x**2 + (648 * I + 76 * t) * x - 68 * t**2 + 51)
         * np.exp(-I / 8 * (-12 * t + 65 * x)) / den)
    p = ((9796900 * I * x**4 + (4056480 - 951520 * I * t) * x**3
          + (-579432 * I + 874464 * I * t**2 - 196992 * t) * x**2
          + (-36448 - 41344 * I * t**3 + 176256 * t**2 - 50592 * I * t) * x
          + 884 * I + 18496 * I * t**4 + 8160 * I * t**2 - 4352 * t)
         * np.exp(-I / 8 * (-12 * t + 65 * x)) / den**2)
    eta = (4624 * t**4 - 10336 * t**3 * x + (218616 * x**2 + 6664) * t**2
           + (-237880 * x**3 + 158440 * x) * t + 2449225 * x**4
           - 136934 * x**2 - 799) / den**2
    return {"Eu": np.real(E), "Ev": np.imag(E), "pu": np.real(p),
            "pv": np.imag(p), "eta": eta}


def build_solver(epochs=50, output_dir="./output_nlsmb_rogue"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("t", "x"), ("Eu", "Ev", "pu", "pv", "eta"), 4, 64)
    equation = {"NLSMB": psci.equation.NLSMB(alpha_1=0.5, alpha_2=-1.0, omega_0=0.25, time=True)}
    geom = psci.geometry.TimeXGeometry(
        psci.geometry.TimeDomain(-0.5, 0.5), psci.geometry.Interval(-0.5, 0.5))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 50}
    eqs = equation["NLSMB"].equations
    interior = psci.constraint.InteriorConstraint(
        eqs, {k: 0 for k in eqs}, geom, {**cfg, "batch_size": 512},
        psci.loss.MSELoss("mean"), name="EQ")

    rng = np.random.default_rng(0)
    tb = rng.uniform(-0.5, 0.5, (256, 1)).astype(np.float32)
    xb = np.where(rng.random((256, 1)) < 0.5, -0.5, 0.5).astype(np.float32)
    t0 = np.full((256, 1), -0.5, np.float32)
    x0 = rng.uniform(-0.5, 0.5, (256, 1)).astype(np.float32)
    tt, xx = np.concatenate([tb, t0]), np.concatenate([xb, x0])
    sol = _rogue(tt, xx)
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
        epochs=epochs, iters_per_epoch=50, equation=equation, log_freq=500)
def _report(solver):
    t, x = np.meshgrid(np.linspace(-0.5, 0.5, 32), np.linspace(-0.5, 0.5, 64), indexing="ij")
    pred = solver.predict({"t": t.reshape(-1, 1).astype(np.float32),
                           "x": x.reshape(-1, 1).astype(np.float32)}, return_numpy=True)
    truth = _rogue(t.reshape(-1, 1), x.reshape(-1, 1))
    l2 = np.sqrt(sum(np.sum((pred[k] - truth[k]) ** 2) for k in truth)
                 / sum(np.sum(truth[k] ** 2) for k in truth))
    print(f"NLS-MB rogue wave combined L2Rel: {l2:.4f}")
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

    @psci.utils.config.main("conf/nlsmb_rogue_wave.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
