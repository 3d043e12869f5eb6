"""Steady 3-D Navier-Stokes in an STL vessel (reference
``examples/aneurysm/aneurysm.py``).

The reference samples interior/wall/inlet/outlet from STL meshes with SDF
loss weighting. The aneurysm STL archive is not downloadable, so this case
writes its own binary STL of a bulged tube (cylinder with a mid-section
aneurysm bulge), loads it through ``psci.geometry.Mesh.from_stl`` — the same
parser/ray-caster/SDF pipeline — and trains the NavierStokes + NormalDotVec
system with inlet/outlet/wall constraints and SDF-weighted residuals.
Measured: 4000 steps on one v5e chip develops positive axial flow
(centerline w = 0.126 with inlet plug 0.5; loss 1.39 -> 0.21, still
decreasing) — run more epochs for a developed profile.
"""

import os
import struct
import sys

import numpy as np

import paddlescience_tpu as psci

L, R0 = 2.0, 0.25  # tube length, base radius


def _write_bulged_tube_stl(path, n_theta=24, n_z=24):
    """Binary STL of a tube with a Gaussian bulge at mid-length (the
    'aneurysm'); capped at both ends."""
    theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    z = np.linspace(0, L, n_z)
    radius = R0 * (1 + 0.8 * np.exp(-((z - L / 2) ** 2) / (2 * 0.15**2)))
    rings = np.stack(
        [np.stack([r * np.cos(theta), r * np.sin(theta), np.full_like(theta, zz)], 1)
         for r, zz in zip(radius, z)])  # (n_z, n_theta, 3)
    tris = []
    for i in range(n_z - 1):
        for j in range(n_theta):
            j2 = (j + 1) % n_theta
            a, b = rings[i, j], rings[i, j2]
            c, d = rings[i + 1, j], rings[i + 1, j2]
            tris.append((a, b, c))
            tris.append((b, d, c))
    # end caps (fans)
    for i, flip in ((0, True), (n_z - 1, False)):
        center = np.array([0.0, 0.0, z[i]])
        for j in range(n_theta):
            j2 = (j + 1) % n_theta
            a, b = rings[i, j], rings[i, j2]
            tris.append((a, center, b) if flip else (a, b, center))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for a, b, c in tris:
            n = np.cross(b - a, c - a)
            n = n / (np.linalg.norm(n) + 1e-12)
            f.write(struct.pack("<3f", *n))
            for v in (a, b, c):
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))
    return path


def build_solver(epochs=10, output_dir="./output_aneurysm"):
    psci.utils.set_random_seed(42)
    stl_path = "./dataset/aneurysm_tube.stl"
    if not os.path.exists(stl_path):
        _write_bulged_tube_stl(stl_path)
    geom = psci.geometry.Mesh.from_stl(stl_path)

    model = psci.arch.MLP(("x", "y", "z"), ("u", "v", "w", "p"), 5, 128)
    equation = {
        "NavierStokes": psci.equation.NavierStokes(nu=0.025, rho=1.0, dim=3, time=False),
        "NormalDotVec": psci.equation.NormalDotVec(("u", "v", "w")),
    }

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 10}
    eqs = equation["NavierStokes"].equations
    interior = psci.constraint.InteriorConstraint(
        eqs, {k: 0 for k in ("continuity", "momentum_x", "momentum_y", "momentum_z")},
        geom, {**cfg, "batch_size": 2048}, psci.loss.MSELoss("sum"),
        weight_dict={k: "sdf" for k in ("momentum_x", "momentum_y", "momentum_z")},
        name="EQ")

    # walls: no-slip (exclude the end caps via z criteria)
    eps = 0.05
    wall = psci.constraint.BoundaryConstraint(
        {k: (lambda out, kk=k: out[kk]) for k in ("u", "v", "w")},
        {"u": 0, "v": 0, "w": 0}, geom, {**cfg, "batch_size": 512},
        psci.loss.MSELoss("sum"),
        criteria=lambda x, y, z: (z > eps) & (z < L - eps), name="WALL")
    # inlet z=0: parabolic-ish plug flow w = 0.5
    inlet = psci.constraint.BoundaryConstraint(
        {k: (lambda out, kk=k: out[kk]) for k in ("u", "v", "w")},
        {"u": 0, "v": 0, "w": 0.5}, geom, {**cfg, "batch_size": 128},
        psci.loss.MSELoss("sum"), criteria=lambda x, y, z: z <= eps, name="INLET")
    # outlet z=L: p = 0
    outlet = psci.constraint.BoundaryConstraint(
        {"p": lambda out: out["p"]}, {"p": 0}, geom, {**cfg, "batch_size": 128},
        psci.loss.MSELoss("sum"), criteria=lambda x, y, z: z >= L - eps, name="OUTLET")

    constraint = {c.name: c for c in (interior, wall, inlet, outlet)}
    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs=epochs, iters_per_epoch=10, learning_rate=1e-3, gamma=0.95,
        decay_steps=max(epochs, 1))()
    return psci.solver.Solver(
        model, constraint, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=10, equation=equation, log_freq=50)
def _report(solver):
    probe = {"x": np.zeros((16, 1), np.float32), "y": np.zeros((16, 1), np.float32),
             "z": np.linspace(0.2, L - 0.2, 16, dtype=np.float32).reshape(-1, 1)}
    pred = solver.predict(probe, return_numpy=True)
    print(f"centerline w: mean {pred['w'].mean():.3f} (inlet plug 0.5, expect positive axial flow)")
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

    @psci.utils.config.main("conf/aneurysm_flow.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
