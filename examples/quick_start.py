"""Quick-start cases (reference ``examples/quick_start/case{1,2,3}``).

case1 — supervised regression of u=sin(x) on [-pi, pi] through
InteriorConstraint (reference case1.py).
case2 — ODE du/dx = cos(x) with one hard boundary point u(-pi)=sin(-pi)+2,
solved via a derivative expression in the constraint (reference case2.py).
case3 — Kirchhoff plate bending: biharmonic w_xxxx + 2 w_xxyy + w_yyyy = q/D
with simply-supported x-edges and free y-edges, L-BFGS (reference
case3.ipynb).
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci
from paddlescience_tpu.autodiff import jacobian


def _sin(data):
    return np.sin(data["x"])


def build_case1(epochs=10, iters_per_epoch=100, output_dir="./outputs_quick_start"):
    psci.utils.set_random_seed(42)
    x_domain = psci.geometry.Interval(-np.pi, np.pi)
    model = psci.arch.MLP(("x",), ("u",), 3, 64)
    interior = psci.constraint.InteriorConstraint(
        {"u": lambda out: out["u"]},
        {"u": _sin},
        x_domain,
        {
            "dataset": "NamedArrayDataset",
            "iters_per_epoch": iters_per_epoch,
            "sampler": {"name": "BatchSampler", "shuffle": True},
            "batch_size": 32,
        },
        psci.loss.MSELoss(),
    )
    optimizer = psci.optimizer.Adam(2e-3)(model)
    solver = psci.solver.Solver(
        model,
        {interior.name: interior},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
    )
    ref = lambda x: np.sin(x)
    return solver, ref


def build_case2(epochs=10, iters_per_epoch=100, output_dir="./outputs_quick_start"):
    psci.utils.set_random_seed(42)
    x_domain = psci.geometry.Interval(-np.pi, np.pi)
    model = psci.arch.MLP(("x",), ("u",), 3, 64)
    interior = psci.constraint.InteriorConstraint(
        {"du_dx": lambda out: jacobian(out["u"], out["x"])},
        {"du_dx": lambda d: np.cos(d["x"])},
        x_domain,
        {
            "dataset": "NamedArrayDataset",
            "iters_per_epoch": iters_per_epoch,
            "sampler": {"name": "BatchSampler", "shuffle": True},
            "batch_size": 32,
        },
        psci.loss.MSELoss(),
    )
    bc = psci.constraint.BoundaryConstraint(
        {"u": lambda d: d["u"]},
        {"u": lambda d: _sin(d) + 2},
        x_domain,
        {
            "dataset": "NamedArrayDataset",
            "iters_per_epoch": iters_per_epoch,
            "sampler": {"name": "BatchSampler", "shuffle": True},
            "batch_size": 1,
        },
        psci.loss.MSELoss(),
        criteria=lambda x: np.isclose(x, -np.pi),
    )
    optimizer = psci.optimizer.Adam(2e-3)(model)
    solver = psci.solver.Solver(
        model,
        {interior.name: interior, bc.name: bc},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
    )
    ref = lambda x: np.sin(x) + 2.0
    return solver, ref


def run_1d_case(solver, ref, output_dir):
    solver.train()
    x = np.linspace(-np.pi, np.pi, 1000, dtype="float32").reshape(1000, 1)
    u_ref = ref(x)
    pred = solver.predict({"x": x}, batch_size=1000, return_numpy=True)["u"]
    l2_rel = float(np.linalg.norm(pred - u_ref) / np.linalg.norm(u_ref))
    print(f"l2_rel = {l2_rel:.5f}")
    psci.visualize.save_plot_from_1d_dict(
        f"{output_dir}/u_pred", {"x": x, "u_pred": pred, "u_ref": u_ref}, ("x",), ("u_pred", "u_ref")
    )
    return l2_rel


def build_case3(epochs=50, iters_per_epoch=1, output_dir="./outputs_quick_start",
                n_interior=20000, n_bc=10000, max_iter=20):
    """Kirchhoff plate bending (case3.ipynb), trained with L-BFGS."""
    import sympy as sp

    psci.utils.set_random_seed(42)
    Lx, Ly = 2.0, 1.0
    E, mu, h, q = 210000.0e6, 0.28, 0.01, 1000.0
    D = E * h**3 / (12 * (1 - mu**2))

    rect = psci.geometry.Rectangle((-Lx / 2, -Ly / 2), (Lx / 2, Ly / 2))
    model = psci.arch.MLP(("x", "y"), ("w",), 4, 50, activation="tanh")

    x, y = sp.symbols("x y")
    w = sp.Function("w")(x, y)
    res = w.diff(x, 4) + 2 * w.diff(x, 2).diff(y, 2) + w.diff(y, 4) - q / D

    dl_cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    pde = psci.constraint.InteriorConstraint(
        {"kirchhoff_res": res}, {"kirchhoff_res": 0.0}, rect,
        {**dl_cfg, "batch_size": n_interior},
        psci.loss.MSELoss(), random="Halton", name="EQ",
    )
    lr_edges = psci.constraint.BoundaryConstraint(
        {"w": w, "ddw_dxx": w.diff(x, 2)}, {"w": 0, "ddw_dxx": 0}, rect,
        {**dl_cfg, "batch_size": n_bc},
        psci.loss.MSELoss(),
        criteria=lambda x, y: np.isclose(x, -Lx / 2) | np.isclose(x, Lx / 2),
        name="BC_lr",
    )
    ud_edges = psci.constraint.BoundaryConstraint(
        {
            "item1": w.diff(y, 2) + mu * w.diff(x, 2),
            "item2": w.diff(y, 3) + (2 - mu) * w.diff(x, 2).diff(y),
        },
        {"item1": 0.0, "item2": 0.0}, rect,
        {**dl_cfg, "batch_size": n_bc},
        psci.loss.MSELoss(),
        criteria=lambda x, y: np.isclose(y, -Ly / 2) | np.isclose(y, Ly / 2),
        name="BC_ud",
    )
    optimizer = psci.optimizer.LBFGS(max_iter=max_iter)(model)
    solver = psci.solver.Solver(
        model,
        {"EQ": pde, "BC_lr": lr_edges, "BC_ud": ud_edges},
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
    )
    return solver


def run_case3(solver, output_dir):
    solver.train()
    n = 101
    gx, gy = np.meshgrid(np.linspace(-1.0, 1.0, n, dtype="float32"),
                         np.linspace(-0.5, 0.5, n, dtype="float32"))
    w_pred = solver.predict(
        {"x": gx.reshape(-1, 1), "y": gy.reshape(-1, 1)}, batch_size=n * n, return_numpy=True
    )["w"]
    print(f"case3 max |w| = {float(np.abs(w_pred).max()):.4e} m")
    return float(np.abs(w_pred).max())


def main_cli():
    import _runner  # noqa: F401

    @psci.utils.config.main("conf/quick_start.yaml")
    def _main(cfg):
        case = int(cfg.get("case", 1))
        out = cfg.get("output_dir") or "./outputs_quick_start"

        def train(c):
            ep = c.TRAIN.epochs
            it = c.TRAIN.iters_per_epoch
            if case == 1:
                return run_1d_case(*build_case1(ep, it, out), out)
            if case == 2:
                return run_1d_case(*build_case2(ep, it, out), out)
            return run_case3(build_case3(ep, 1, out, max_iter=c.TRAIN.lbfgs_max_iter), out)

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
