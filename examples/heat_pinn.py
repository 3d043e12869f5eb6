"""Heat PINN: 2D steady heat conduction vs an FDM oracle (reference
``examples/heat_pinn/heat_pinn.py``).

Laplace(u)=0 on [-1,1]^2 with Dirichlet walls T(left)=75, T(right)=0,
T(bottom)=50, T(top)=0 (normalized by 75). The FDM oracle (reference
``heat_pinn/fdm.py``) is re-implemented as a vectorized Jacobi iteration
instead of the reference's dense matrix inverse (O(n^6) memory-free here).
Final report: normalized MSE between PINN and FDM fields.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci


def fdm_solve(n: int, iters: int = 30000) -> np.ndarray:
    """5-point Laplace stencil with Dirichlet walls, Jacobi-iterated
    (same discrete solution as reference fdm.py's direct solve)."""
    T = np.zeros((n + 2, n + 2), np.float64)
    # walls (reference fdm.py:32 bc dict): y=-l -> 50 (first row of the
    # interior grid), y=+l -> 0, x=-l -> 75, x=+l -> 0
    T[0, :] = 50.0
    T[-1, :] = 0.0
    T[:, 0] = 75.0
    T[:, -1] = 0.0
    for _ in range(iters):
        T[1:-1, 1:-1] = 0.25 * (T[:-2, 1:-1] + T[2:, 1:-1] + T[1:-1, :-2] + T[1:-1, 2:])
    return T[1:-1, 1:-1]


def build_solver(epochs=50, iters_per_epoch=20, output_dir="./outputs_heat_pinn",
                 learning_rate=5e-4, w_top=0.25, w_bottom=0.25, w_left=0.25, w_right=0.25):
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y"), ("u",), 9, 20, activation="tanh")
    equation = {"heat": psci.equation.Laplace(dim=2)}
    geom = {"rect": psci.geometry.Rectangle((-1.0, -1.0), (1.0, 1.0))}

    NPOINT_PDE, NPOINT_BC = 99**2, 25
    train_dataloader_cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    pde_constraint = psci.constraint.InteriorConstraint(
        equation["heat"].equations,
        {"laplace": 0},
        geom["rect"],
        {**train_dataloader_cfg, "batch_size": NPOINT_PDE},
        psci.loss.MSELoss("mean"),
        evenly=True,
        name="EQ",
    )

    def bc(name, value, criteria, weight):
        return psci.constraint.BoundaryConstraint(
            {"u": lambda out: out["u"]},
            {"u": value},
            geom["rect"],
            {**train_dataloader_cfg, "batch_size": NPOINT_BC},
            psci.loss.MSELoss("mean"),
            weight_dict={"u": weight},
            criteria=criteria,
            name=name,
        )

    constraint = {
        "EQ": pde_constraint,
        "BC_top": bc("BC_top", 0.0, lambda x, y: np.isclose(y, 1), w_top),
        "BC_bottom": bc("BC_bottom", 50 / 75, lambda x, y: np.isclose(y, -1), w_bottom),
        "BC_left": bc("BC_left", 1.0, lambda x, y: np.isclose(x, -1), w_left),
        "BC_right": bc("BC_right", 0.0, lambda x, y: np.isclose(x, 1), w_right),
    }
    optimizer = psci.optimizer.Adam(learning_rate)(model)
    return psci.solver.Solver(
        model,
        constraint,
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        eval_during_train=False,
        equation=equation,
    )


def evaluate_vs_fdm(solver, n_eval=100):
    xs = np.linspace(-1, 1, n_eval, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    pinn = solver.predict(
        {"x": gx.reshape(-1, 1), "y": gy.reshape(-1, 1)},
        batch_size=n_eval * n_eval,
        return_numpy=True,
    )["u"].reshape(n_eval, n_eval)
    # FDM grid: rows = y index, cols = x index; transpose to (x, y) like the
    # reference's fdm.solve(N, 1).T
    fdm = fdm_solve(n_eval).T
    mse = float(np.mean(np.square(pinn - fdm / 75.0)))
    print(f"The norm MSE loss between the FDM and PINN is {mse:.6e}")
    return mse


def main_cli():
    import _runner

    @psci.utils.config.main("conf/heat_pinn.yaml")
    def _main(cfg):
        def train(c):
            solver = _runner.build_from_cfg(c, build_solver)
            solver.train()
            return evaluate_vs_fdm(solver)

        def evaluate(c):
            solver = _runner.build_from_cfg(c, build_solver)
            path = c.get_path("EVAL.pretrained_model_path")
            if path:
                solver.load_pretrain(path)
            return evaluate_vs_fdm(solver)

        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate,
            export=lambda c: _runner.export(c, lambda cc: _runner.build_from_cfg(cc, build_solver)),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
