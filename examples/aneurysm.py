"""Aneurysm 3-D internal flow over STL geometry (reference
``examples/aneurysm/aneurysm.py``).

The full STL pipeline: five mesh parts (inlet/outlet caps, noslip wall,
watertight closed surface, mid-vessel integral plane) are sampled through
the framework's own STL parser + ray-cast interior sampler
(``geometry/mesh.py``), normalized with translate/scale, and drive NS-3D
with a parabolic inlet, pressure outlet, no-slip wall, plus TWO integral
mass-flow constraints via NormalDotVec (reference :113-140). The reference
downloads its vessel STLs; here ``tools/gen_aneurysm_stl.py`` builds a
parametric curved vessel with a spherical bulge (same part structure), and
the eval is an interior residual validator instead of the reference's
downloaded probe CSVs.
"""

from __future__ import annotations

import os

import numpy as np

import paddlescience_tpu as psci

_STL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "dataset", "aneurysm")

NU, RHO, DIM = 0.025, 1.0, 3
SCALE = 0.4
CENTER = (0.35 * np.sin(np.pi / 2) / 2, 0.0, 4.0)  # rough mesh centroid
INLET_CENTER = (0.0, 0.0, 0.0)
INLET_NORMAL = (0.0, 0.0, 1.0)
INLET_VEL = 1.5
INLET_RADIUS = 0.6


def build_solver(epochs=100, iters_per_epoch=100, output_dir="./output_aneurysm",
                 bs_pde=2048, bs_bc=512, bs_igc=1, integral_bs=512):
    if not os.path.exists(os.path.join(_STL, "aneurysm_closed.stl")):
        raise FileNotFoundError(
            f"aneurysm STLs not found under '{_STL}' — generate them with "
            "`python tools/gen_aneurysm_stl.py`")
    psci.utils.set_random_seed(42)
    model = psci.arch.MLP(("x", "y", "z"), ("u", "v", "w", "p"), 6, 512,
                          activation="silu", weight_norm=True)
    equation = {
        "NavierStokes": psci.equation.NavierStokes(NU * SCALE, RHO, DIM, False),
        "NormalDotVec": psci.equation.NormalDotVec(("u", "v", "w")),
    }

    center = np.asarray(CENTER)
    load = lambda part: psci.geometry.Mesh(
        os.path.join(_STL, f"aneurysm_{part}.stl")).translate(-center).scale(SCALE)
    geom = {p: load(p) for p in ("inlet", "outlet", "noslip", "integral", "closed")}

    inlet_area = np.pi * INLET_RADIUS**2 * SCALE**2
    inlet_radius = INLET_RADIUS * SCALE
    flow_rate = 0.5 * INLET_VEL * inlet_area  # parabolic profile mean = vmax/2

    inlet_c = (np.asarray(INLET_CENTER) - center) * SCALE

    def _parabola(d):
        r2 = ((d["x"] - inlet_c[0]) ** 2 + (d["y"] - inlet_c[1]) ** 2
              + (d["z"] - inlet_c[2]) ** 2)
        return INLET_VEL * np.maximum(1 - r2 / inlet_radius**2, 0.0)

    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 1}
    bc_inlet = psci.constraint.BoundaryConstraint(
        {k: (lambda d, kk=k: d[kk]) for k in ("u", "v", "w")},
        {"u": lambda d: INLET_NORMAL[0] * _parabola(d),
         "v": lambda d: INLET_NORMAL[1] * _parabola(d),
         "w": lambda d: INLET_NORMAL[2] * _parabola(d)},
        geom["inlet"], {**cfg, "batch_size": bs_bc},
        psci.loss.MSELoss("sum"), name="inlet")
    bc_outlet = psci.constraint.BoundaryConstraint(
        {"p": lambda d: d["p"]}, {"p": 0.0},
        geom["outlet"], {**cfg, "batch_size": bs_bc},
        psci.loss.MSELoss("sum"), name="outlet")
    bc_noslip = psci.constraint.BoundaryConstraint(
        {k: (lambda d, kk=k: d[kk]) for k in ("u", "v", "w")},
        {"u": 0.0, "v": 0.0, "w": 0.0},
        geom["noslip"], {**cfg, "batch_size": 2 * bs_bc},
        psci.loss.MSELoss("sum"), name="no_slip")
    pde = psci.constraint.InteriorConstraint(
        equation["NavierStokes"].equations,
        {"continuity": 0, "momentum_x": 0, "momentum_y": 0, "momentum_z": 0},
        geom["closed"], {**cfg, "batch_size": bs_pde},
        psci.loss.MSELoss("sum"), name="interior")
    igc_outlet = psci.constraint.IntegralConstraint(
        equation["NormalDotVec"].equations, {"normal_dot_vec": flow_rate},
        geom["outlet"], {**cfg, "batch_size": bs_igc},
        psci.loss.IntegralLoss("sum"),
        integral_batch_size=integral_bs,
        weight_dict={"normal_dot_vec": 0.1}, name="igc_outlet")
    igc_integral = psci.constraint.IntegralConstraint(
        equation["NormalDotVec"].equations, {"normal_dot_vec": -flow_rate},
        geom["integral"], {**cfg, "batch_size": bs_igc},
        psci.loss.IntegralLoss("sum"),
        integral_batch_size=integral_bs,
        weight_dict={"normal_dot_vec": 0.1}, name="igc_integral")
    constraint = {c.name: c for c in
                  (bc_inlet, bc_outlet, bc_noslip, pde, igc_outlet, igc_integral)}

    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=1e-3,
        gamma=0.95, decay_steps=15000)()
    optimizer = psci.optimizer.Adam(lr)(model)

    validator = {
        "residual": psci.validate.GeometryValidator(
            equation["NavierStokes"].equations,
            {"continuity": 0, "momentum_x": 0, "momentum_y": 0, "momentum_z": 0},
            geom["closed"],
            {"dataset": "NamedArrayDataset", "total_size": 4096, "batch_size": 2048},
            psci.loss.MSELoss("sum"),
            metric={"MSE": psci.metric.MSE()},
            name="residual")
    }
    return psci.solver.Solver(
        model, constraint, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator=validator, equation=equation, log_freq=100)


def main_cli():
    import _runner

    @psci.utils.config.main("conf/aneurysm.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
