"""Biharmonic plate bending PINN (reference ``examples/biharmonic2d/``).

Fourth-order PDE lap(lap(w)) = q/D for a simply-supported square plate under
sinusoidal load q = q0 sin(pi x/a) sin(pi y/a); the exact Navier solution is
w = q0/(4 pi^4 D / a^4) sin(pi x/a) sin(pi y/a). Exercises 4th-order
derivative components (nested jvp depth 4) through the sympy Biharmonic
equation.
"""

import sys

import numpy as np

import paddlescience_tpu as psci

A, Q0, D = 1.0, 1.0, 1.0
W0 = Q0 * A**4 / (4 * np.pi**4 * D)  # exact amplitude


def w_exact(x, y):
    return W0 * np.sin(np.pi * x / A) * np.sin(np.pi * y / A)


def build_solver(epochs=40, output_dir="./output_biharmonic2d"):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y"), ("u",), 4, 32)
    # hard-enforce the simply-supported BC w=0 on the boundary:
    # w = x(a-x) y(a-y) * net  (also helps the 4th-order optimization)
    model.register_output_transform(
        lambda inp, out: {"u": inp["x"] * (A - inp["x"]) * inp["y"] * (A - inp["y"]) * out["u"]})
    # residual is nabla^4(u) - q/D; q=0 here, the sinusoidal load enters as the label
    equation = {"Biharmonic": psci.equation.Biharmonic(dim=2, q=0.0, D=D)}
    geom = psci.geometry.Rectangle((0.0, 0.0), (A, A))

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 25}
    interior = psci.constraint.InteriorConstraint(
        equation["Biharmonic"].equations,
        {"biharmonic": lambda d: (Q0 / D) * np.sin(np.pi * d["x"] / A) * np.sin(np.pi * d["y"] / A)},
        geom, {**cfg, "batch_size": 1024}, psci.loss.MSELoss("sum"), name="EQ")

    return psci.solver.Solver(
        model, {"EQ": interior}, output_dir,
        psci.optimizer.Adam(2e-3)(model),
        epochs=epochs, iters_per_epoch=25, equation=equation, log_freq=200)
def _report(solver):
    x, y = np.meshgrid(np.linspace(0, A, 32), np.linspace(0, A, 32), indexing="ij")
    pred = solver.predict({"x": x.reshape(-1, 1).astype(np.float32),
                           "y": y.reshape(-1, 1).astype(np.float32)}, return_numpy=True)["u"]
    truth = w_exact(x.reshape(-1, 1), y.reshape(-1, 1))
    l2 = float(np.linalg.norm(pred - truth) / np.linalg.norm(truth))
    print(f"biharmonic plate L2Rel vs Navier solution: {l2:.4f}")
    return l2

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

    @psci.utils.config.main("conf/biharmonic2d.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
