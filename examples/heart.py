"""Heart: passive left-ventricle inflation — forward simulation and inverse
estimation of the myocardial stiffness E (reference
``examples/heart/forward.py``, ``inverse.py``, ``equation.py``).

Hooke elasticity (``psci.equation.Hooke``) on a ventricle-like half-ellipsoid
shell: displacement fixed on the base annulus, cavity pressure P on the
endocardium, traction-free epicardium, equilibrium residuals in the wall.
The four reference STL meshes (heart/base/endo/epi) are procedurally
generated half-ellipsoid shells when the real geometry is absent. A small
synthetic radial-inflation displacement field plays the role of the
reference's CSV measurement data (documented fallback).

Inverse (problem=inverse): E becomes a learnable scalar
(``Hooke(E=("learnable", E0), ...)``) fitted from the displacement data with
the forward nets free — the final metric is |E_hat - E_true|/E_true.
"""

from __future__ import annotations

import os
import os.path as osp
import struct

import numpy as np

import paddlescience_tpu as psci


def _tri_mesh_from_grid(P):
    """P: (nu, nv, 3) parametric grid -> triangle list."""
    tris = []
    nu, nv = P.shape[:2]
    for i in range(nu - 1):
        for j in range(nv - 1):
            a, b, c, d = P[i, j], P[i + 1, j], P[i, j + 1], P[i + 1, j + 1]
            tris.append((a, b, c))
            tris.append((b, d, c))
    return tris


def _half_ellipsoid(rx, ry, rz, nu=16, nv=32, inward=False):
    """Bottom half (z<=0) of an ellipsoid, parametrized from equator to pole."""
    th = np.linspace(np.pi / 2, np.pi, nu)  # polar angle from +z
    ph = np.linspace(0, 2 * np.pi, nv)
    T, Ph = np.meshgrid(th, ph, indexing="ij")
    P = np.stack([rx * np.sin(T) * np.cos(Ph), ry * np.sin(T) * np.sin(Ph), rz * np.cos(T)], -1)
    tris = _tri_mesh_from_grid(P)
    if inward:
        tris = [(a, c, b) for a, b, c in tris]
    return tris


def _annulus(r_in, r_out, z=0.0, nv=32, up=True):
    ph = np.linspace(0, 2 * np.pi, nv)
    ring_i = np.stack([r_in * np.cos(ph), r_in * np.sin(ph), np.full_like(ph, z)], -1)
    ring_o = np.stack([r_out * np.cos(ph), r_out * np.sin(ph), np.full_like(ph, z)], -1)
    tris = []
    for j in range(nv - 1):
        a, b = ring_i[j], ring_i[j + 1]
        c, d = ring_o[j], ring_o[j + 1]
        tris.append((a, c, b) if up else (a, b, c))
        tris.append((b, c, d) if up else (b, d, c))
    return tris


def _write_stl(path, tris):
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for a, b, c in tris:
            n = np.cross(np.asarray(b) - a, np.asarray(c) - a)
            n = n / (np.linalg.norm(n) + 1e-12)
            f.write(struct.pack("<3f", *n))
            for v in (a, b, c):
                f.write(struct.pack("<3f", *np.asarray(v, np.float64)))
            f.write(struct.pack("<H", 0))
    return path


R_ENDO = (0.7, 0.7, 1.4)
R_EPI = (1.0, 1.0, 1.8)


def _gen_geometry(base_dir):
    paths = {k: osp.join(base_dir, f"heart_{k}.stl") for k in ("geo", "base", "endo", "epi")}
    if not all(osp.exists(p) for p in paths.values()):
        print(f"[heart] STL meshes absent under {base_dir} -> generating half-ellipsoid ventricle shell")
        epi = _half_ellipsoid(*R_EPI)
        endo = _half_ellipsoid(*R_ENDO, inward=True)
        base = _annulus(R_ENDO[0], R_EPI[0], up=True)
        _write_stl(paths["geo"], epi + endo + base)
        _write_stl(paths["epi"], _half_ellipsoid(*R_EPI))
        _write_stl(paths["endo"], _half_ellipsoid(*R_ENDO))
        _write_stl(paths["base"], base)
    return {k: psci.geometry.Mesh.from_stl(p) for k, p in paths.items()}


def _synthetic_displacement(xyz, scale=0.02):
    """Small radial inflation field (synthetic stand-in for the CSV data)."""
    r = np.linalg.norm(xyz, axis=1, keepdims=True) + 1e-9
    return scale * xyz / r


def build_solver(problem="forward", epochs=200, iters_per_epoch=20,
                 output_dir="./outputs_heart", geom_dir="./dataset/heart",
                 e=9.0, nu=0.45, p=1.064, lr=1e-3, gamma=0.95,
                 n_interior=1024, n_bc=128, n_data=512):
    psci.utils.set_random_seed(42)
    geoms = _gen_geometry(geom_dir)
    model = psci.arch.MLP(("x", "y", "z"), ("u", "v", "w"), 6, 256, activation="tanh")

    E_spec = ("learnable", e * 2.0) if problem == "inverse" else e
    equation = {"Hooke": psci.equation.Hooke(E=E_spec, nu=nu, P=p, dim=3)}
    eqs = equation["Hooke"].equations
    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}

    bc_base = psci.constraint.BoundaryConstraint(
        {"u": lambda d: d["u"], "v": lambda d: d["v"], "w": lambda d: d["w"]},
        {"u": 0, "v": 0, "w": 0},
        geoms["base"], {**cfg, "batch_size": n_bc}, psci.loss.MSELoss("mean"),
        name="BC_BASE",
    )
    bc_endo = psci.constraint.BoundaryConstraint(
        {"traction": eqs["traction"]},
        {"traction": -p},
        geoms["endo"], {**cfg, "batch_size": n_bc}, psci.loss.MSELoss("mean"),
        name="BC_ENDO",
    )
    bc_epi = psci.constraint.BoundaryConstraint(
        {"traction": eqs["traction"]},
        {"traction": 0},
        geoms["epi"], {**cfg, "batch_size": n_bc}, psci.loss.MSELoss("mean"),
        name="BC_EPI",
    )
    interior = psci.constraint.InteriorConstraint(
        eqs, {"hooke_x": 0, "hooke_y": 0, "hooke_z": 0},
        geoms["geo"], {**cfg, "batch_size": n_interior}, psci.loss.MSELoss("mean"),
        name="INTERIOR",
    )
    constraint = {c.name: c for c in (bc_base, bc_endo, bc_epi, interior)}

    # measurement data (reference DATA constraint from CSV; synthetic here)
    samples = geoms["geo"].sample_interior(n_data)
    xyz = np.concatenate([samples["x"], samples["y"], samples["z"]], 1)
    disp = _synthetic_displacement(xyz).astype("float32")
    data_input = {"x": samples["x"], "y": samples["y"], "z": samples["z"]}
    data_label = {"u": disp[:, :1], "v": disp[:, 1:2], "w": disp[:, 2:3]}
    constraint["DATA"] = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset", "input": data_input, "label": data_label},
         "batch_size": n_data, "iters_per_epoch": iters_per_epoch,
         "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": False}},
        psci.loss.MSELoss("sum"),
        name="DATA",
    )

    validator = {
        "ref_u_v_w": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset", "input": data_input, "label": data_label},
             "total_size": n_data, "batch_size": n_data,
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.MSELoss("mean"),
            {"u": lambda out: out["u"], "v": lambda out: out["v"], "w": lambda out: out["w"]},
            metric={"L2Rel": psci.metric.L2Rel()},
            name="ref_u_v_w",
        )
    }
    lr_sched = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs, iters_per_epoch, lr, gamma=gamma, decay_steps=max(epochs // 20, 1) * iters_per_epoch)()
    optimizer = psci.optimizer.Adam(lr_sched)(model)
    solver = psci.solver.Solver(
        model, constraint, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        eval_during_train=False, validator=validator, equation=equation,
    )
    return solver


def train_and_report(c):
    """Train; in inverse mode report |E_hat - E_true|/E_true (shared by the
    forward entry and examples/heart_inverse.py)."""
    import _runner

    solver = _runner.build_from_cfg(c, build_solver)
    solver.train()
    metric, group = solver.eval()
    _runner._print_metrics("final", metric, group)
    if c.problem == "inverse":
        e_hat = float(np.asarray(solver.state["eq_params"]["E"]))
        rel = abs(e_hat - c.e) / c.e
        print(f"inverse E estimate = {e_hat:.4f} kPa (true {c.e}), rel err {rel:.3f}")
        return rel
    return metric


def main_cli():
    import _runner

    @psci.utils.config.main("conf/heart.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train_and_report,
            evaluate=lambda c: _runner.evaluate(c, lambda cc: _runner.build_from_cfg(cc, build_solver)),
            export=lambda c: _runner.export(c, lambda cc: _runner.build_from_cfg(cc, build_solver)),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
