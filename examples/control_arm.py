"""Control arm: 3D linear elasticity on an STL mesh — forward analysis and
inverse material-parameter identification (reference
``examples/control_arm/forward_analysis.py`` and ``inverse_parameter.py``).

Forward (problem=forward): displacement net + stress net (ModelList) solve
the 9-equation mixed form on a Mesh geometry with a traction load on the
left bolt circle, fixed displacement on the right bolt circle,
traction-free remaining surface, and sdf-weighted interior residuals.

Inverse (problem=inverse): freeze the trained disp/stress nets and train
two extra MLPs outputting the Lame parameters ``lambda_``/``mu`` referenced
by name inside LinearElasticity (reference inverse_parameter.py:19-96); a
validator checks them against the true values.

When ``geom_path`` (control_arm.stl) is absent, a procedurally generated
capsule-bar STL on the same bolt-circle layout is written and used (the
Mesh/SDF machinery — own STL parser + C++ ray-cast kernels — is exercised
either way).
"""

from __future__ import annotations

import os
import os.path as osp
import struct

import numpy as np

import paddlescience_tpu as psci

LEFT_C = (-1.0, 0.0)   # bolt circle in (x, y) at the left end
RIGHT_C = (1.0, 0.0)   # bolt circle in (x, z) at the right end
R_BOLT = 0.25


def _write_arm_stl(path, length=2.4, radius=0.3, n_theta=24, n_z=16):
    """Closed cylinder along x from -length/2 to length/2 (simplified arm)."""
    theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    xs = np.linspace(-length / 2, length / 2, n_z)
    rings = np.stack(
        [np.stack([np.full_like(theta, xx), radius * np.cos(theta), radius * np.sin(theta)], 1) for xx in xs]
    )
    tris = []
    for i in range(n_z - 1):
        for j in range(n_theta):
            j2 = (j + 1) % n_theta
            a, b = rings[i, j], rings[i, j2]
            c, d = rings[i + 1, j], rings[i + 1, j2]
            tris.append((a, c, b))
            tris.append((b, c, d))
    for i, flip in ((0, False), (n_z - 1, True)):
        center = np.array([xs[i], 0.0, 0.0])
        for j in range(n_theta):
            j2 = (j + 1) % n_theta
            a, b = rings[i, j], rings[i, j2]
            tris.append((a, center, b) if flip else (a, b, center))
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
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


def _criteria():
    left = lambda x, y, z: np.sqrt((x - LEFT_C[0]) ** 2 + (y - LEFT_C[1]) ** 2) <= R_BOLT + 1e-1
    right = lambda x, y, z: np.sqrt((x - RIGHT_C[0]) ** 2 + (z - RIGHT_C[1]) ** 2) <= R_BOLT + 1e-1
    surface = lambda x, y, z: np.sqrt((x - LEFT_C[0]) ** 2 + (y - LEFT_C[1]) ** 2) > R_BOLT + 1e-1
    return left, right, surface


def _nets(seed=2023):
    psci.utils.set_random_seed(seed)
    disp_net = psci.arch.MLP(("x", "y", "z"), ("u", "v", "w"), 6, 512, activation="silu",
                             weight_norm=True)
    stress_net = psci.arch.MLP(
        ("x", "y", "z"),
        ("sigma_xx", "sigma_yy", "sigma_zz", "sigma_xy", "sigma_xz", "sigma_yz"),
        6, 512, activation="silu", weight_norm=True, rngs=psci.nn.Rngs(1),
    )
    return disp_net, stress_net


def _geom(geom_path):
    if not osp.exists(geom_path):
        print(f"[control_arm] {geom_path!r} absent -> generating capsule-bar STL")
        _write_arm_stl(geom_path)
    return psci.geometry.Mesh.from_stl(geom_path)


def build_forward(epochs=2000, iters_per_epoch=100, output_dir="./outputs_control_arm",
                  geom_path="./dataset/control_arm.stl", nu=0.3, e=1.0,
                  traction=(-0.0025, 0.0, 0.0), lr=1e-3, gamma=0.95,
                  n_interior=2048, n_bc=128, hidden=None, layers=None):
    lambda_ = nu * e / ((1 + nu) * (1 - 2 * nu))
    mu = e / (2 * (1 + nu))
    disp_net, stress_net = _nets()
    model = psci.arch.ModelList((disp_net, stress_net))
    equation = {"LinearElasticity": psci.equation.LinearElasticity(
        E=None, nu=None, lambda_=lambda_, mu=mu, dim=3)}
    geom = _geom(geom_path)
    left, right, surface = _criteria()
    eqs = equation["LinearElasticity"].equations
    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}

    bc_left = psci.constraint.BoundaryConstraint(
        {k: eqs[k] for k in ("traction_x", "traction_y", "traction_z")},
        {"traction_x": traction[0], "traction_y": traction[1], "traction_z": traction[2]},
        geom, {**cfg, "batch_size": n_bc}, psci.loss.MSELoss("sum"),
        criteria=left, name="BC_LEFT",
    )
    bc_right = psci.constraint.BoundaryConstraint(
        {"u": lambda d: d["u"], "v": lambda d: d["v"], "w": lambda d: d["w"]},
        {"u": 0, "v": 0, "w": 0},
        geom, {**cfg, "batch_size": n_bc}, psci.loss.MSELoss("sum"),
        criteria=right, name="BC_RIGHT",
    )
    bc_surface = psci.constraint.BoundaryConstraint(
        {k: eqs[k] for k in ("traction_x", "traction_y", "traction_z")},
        {"traction_x": 0, "traction_y": 0, "traction_z": 0},
        geom, {**cfg, "batch_size": 4 * n_bc}, psci.loss.MSELoss("sum"),
        criteria=surface, name="BC_SURFACE",
    )
    resid_keys = ("equilibrium_x", "equilibrium_y", "equilibrium_z",
                  "stress_disp_xx", "stress_disp_yy", "stress_disp_zz",
                  "stress_disp_xy", "stress_disp_xz", "stress_disp_yz")
    interior = psci.constraint.InteriorConstraint(
        eqs, {k: 0 for k in resid_keys}, geom,
        {**cfg, "batch_size": n_interior}, psci.loss.MSELoss("sum"),
        weight_dict={k: "sdf" for k in resid_keys},
        name="INTERIOR",
    )
    constraint = {c.name: c for c in (bc_left, bc_right, bc_surface, interior)}
    lr_sched = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs, iters_per_epoch, lr, gamma=gamma, decay_steps=15 * iters_per_epoch)()
    optimizer = psci.optimizer.Adam(lr_sched)(model)
    solver = psci.solver.Solver(
        model, constraint, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        eval_during_train=False, equation=equation,
    )
    return solver, geom


def build_inverse(fwd_solver, geom, epochs=100, iters_per_epoch=100,
                  output_dir="./outputs_control_arm_inverse", nu=0.3, e=1.0,
                  lr=1e-3, n_interior=2048):
    lambda_true = nu * e / ((1 + nu) * (1 - 2 * nu))
    mu_true = e / (2 * (1 + nu))
    disp_net, stress_net = fwd_solver.models[0], fwd_solver.models[1]
    lam_net = psci.arch.MLP(("x", "y", "z"), ("lambda_",), 3, 32, rngs=psci.nn.Rngs(7))
    mu_net = psci.arch.MLP(("x", "y", "z"), ("mu",), 3, 32, rngs=psci.nn.Rngs(8))
    disp_net.freeze()
    stress_net.freeze()
    model = psci.arch.ModelList((disp_net, stress_net, lam_net, mu_net))

    equation = {"LinearElasticity": psci.equation.LinearElasticity(
        E=None, nu=None, lambda_="lambda_", mu="mu", dim=3)}
    eqs = equation["LinearElasticity"].equations
    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": iters_per_epoch}
    resid_keys = ("stress_disp_xx", "stress_disp_yy", "stress_disp_zz",
                  "stress_disp_xy", "stress_disp_xz", "stress_disp_yz")
    interior = psci.constraint.InteriorConstraint(
        eqs, {k: 0 for k in resid_keys}, geom,
        {**cfg, "batch_size": n_interior}, psci.loss.MSELoss("sum"),
        name="INTERIOR",
    )
    validator = {
        "elasticity": psci.validate.GeometryValidator(
            {"lambda_": lambda out: out["lambda_"], "mu": lambda out: out["mu"]},
            {"lambda_": lambda_true, "mu": mu_true},
            geom,
            {"dataset": "NamedArrayDataset", "total_size": 512, "batch_size": 512},
            psci.loss.MSELoss("mean"),
            metric={"L2Rel": psci.metric.L2Rel()},
            name="elasticity",
        )
    }
    optimizer = psci.optimizer.Adam(lr)(model)
    inv = psci.solver.Solver(
        model, {"INTERIOR": interior}, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        eval_during_train=False, validator=validator, equation=equation,
    )
    # carry trained disp/stress params into the 4-net tree (children 0 and 1)
    fwd_params = fwd_solver.state["params"]["model_list"]
    inv.state["params"]["model_list"]["0"] = fwd_params["0"]
    inv.state["params"]["model_list"]["1"] = fwd_params["1"]
    return inv


def main_cli():
    import _runner

    @psci.utils.config.main("conf/control_arm.yaml")
    def _main(cfg):
        def train(c):
            fwd, geom = _runner.build_from_cfg(c, build_forward)
            fwd.train()
            if c.problem == "forward":
                return None
            inv = build_inverse(fwd, geom, epochs=c.TRAIN.inverse_epochs,
                                iters_per_epoch=c.TRAIN.iters_per_epoch,
                                nu=c.nu, e=c.e, lr=c.TRAIN.lr,
                                n_interior=c.TRAIN.n_interior)
            inv.train()
            metric, group = inv.eval()
            _runner._print_metrics("inverse", metric, group)
            return metric

        def evaluate(c):
            fwd, geom = _runner.build_from_cfg(c, build_forward)
            path = c.get_path("EVAL.pretrained_model_path")
            if path:
                fwd.load_pretrain(path)
            samples = geom.sample_interior(512)
            out = fwd.predict({k: samples[k] for k in ("x", "y", "z")},
                              batch_size=512, return_numpy=True)
            stats = {k: float(np.abs(v).mean()) for k, v in out.items()}
            print(f"forward field mean |.|: {stats}")
            return stats

        return psci.utils.config.dispatch(cfg, train=train, evaluate=evaluate)

    return _main()


if __name__ == "__main__":
    main_cli()
