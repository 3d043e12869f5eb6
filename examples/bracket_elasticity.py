"""3-D linear elasticity on a cantilever block (reference
``examples/bracket/bracket.py`` — bracket uses STL meshes; this case runs
the same LinearElasticity system on a Cuboid: fixed at x=0, surface traction
pulling down at x=L, traction-free elsewhere).

Exercises the 9-equation mixed displacement-stress formulation
(stress_disp_*, equilibrium_*, traction_*) with boundary normals.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def build_solver(epochs=30, iters_per_epoch=20, output_dir="./output_bracket"):
    psci.utils.set_random_seed(42)
    # displacement net + stress net (reference uses two MLPs via ModelList)
    disp_net = psci.arch.MLP(("x", "y", "z"), ("u", "v", "w"), 4, 64)
    stress_net = psci.arch.MLP(
        ("x", "y", "z"),
        ("sigma_xx", "sigma_yy", "sigma_zz", "sigma_xy", "sigma_xz", "sigma_yz"),
        4,
        64,
        rngs=psci.nn.Rngs(1),
    )
    model = psci.arch.ModelList((disp_net, stress_net))

    # nondimensionalized material (reference bracket: E=100 GPa, nu=0.3)
    equation = {
        "LinearElasticity": psci.equation.LinearElasticity(E=None, nu=0.3, lambda_=1.5, mu=1.0, dim=3)
    }
    geom = psci.geometry.Cuboid((0.0, 0.0, 0.0), (2.0, 0.5, 0.5))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    eqs = equation["LinearElasticity"].equations

    interior = psci.constraint.InteriorConstraint(
        eqs,
        {k: 0 for k in ("stress_disp_xx", "stress_disp_yy", "stress_disp_zz",
                         "stress_disp_xy", "stress_disp_xz", "stress_disp_yz",
                         "equilibrium_x", "equilibrium_y", "equilibrium_z")},
        geom,
        {**cfg, "batch_size": 1024},
        psci.loss.MSELoss("sum"),
        name="INTERIOR",
    )
    bc_fixed = psci.constraint.BoundaryConstraint(
        {"u": lambda d: d["u"], "v": lambda d: d["v"], "w": lambda d: d["w"]},
        {"u": 0, "v": 0, "w": 0},
        geom,
        {**cfg, "batch_size": 128},
        psci.loss.MSELoss("sum"),
        criteria=lambda x, y, z: np.isclose(x, 0.0),
        name="BC_FIXED",
    )
    bc_load = psci.constraint.BoundaryConstraint(
        {k: eqs[k] for k in ("traction_x", "traction_y", "traction_z")},
        {"traction_x": 0, "traction_y": 0, "traction_z": -0.1},
        geom,
        {**cfg, "batch_size": 128},
        psci.loss.MSELoss("sum"),
        criteria=lambda x, y, z: np.isclose(x, 2.0),
        name="BC_LOAD",
    )
    bc_free = psci.constraint.BoundaryConstraint(
        {k: eqs[k] for k in ("traction_x", "traction_y", "traction_z")},
        {"traction_x": 0, "traction_y": 0, "traction_z": 0},
        geom,
        {**cfg, "batch_size": 512},
        psci.loss.MSELoss("sum"),
        criteria=lambda x, y, z: ~(np.isclose(x, 0.0) | np.isclose(x, 2.0)),
        name="BC_FREE",
    )
    constraint = {c.name: c for c in (interior, bc_fixed, bc_load, bc_free)}

    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3, gamma=0.95,
        decay_steps=max(epochs * iters_per_epoch // 20, 1),
    )()
    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        equation=equation,
        log_freq=100,
    )
def _report(solver):
    pred = solver.predict(
        {"x": np.full((16, 1), 2.0, np.float32),
         "y": np.full((16, 1), 0.25, np.float32),
         "z": np.linspace(0, 0.5, 16, dtype=np.float32).reshape(-1, 1)},
        return_numpy=True,
    )
    print(f"tip w mean = {pred['w'].mean():.4e} (should be < 0 under downward load)")
    return float(pred["w"].mean())

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

    @psci.utils.config.main("conf/bracket_elasticity.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
