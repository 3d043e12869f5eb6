"""PhyGeoNet: physics-informed geometry-adaptive CNN on a curvilinear grid
(reference ``examples/phygeonet/heat_equation.py`` + ``utils.py``).

A USCNN maps body-fitted grid coordinates to the temperature field; the loss
is the Laplace residual computed with 4th-order finite differences in
reference coordinates (xi, eta) mapped through the mesh metric terms
(dfdx/dfdy, reference utils.py:9-178). Dirichlet BCs (T=0 on the outer edge,
T=1 on the other three) are imposed by overwriting the padded frame inside
the output transform.

Data: ``data_dir`` (heat_equation.npz with coords/jinvs/dxdxis/...). When
absent, a quarter-annulus curvilinear mesh is generated analytically with
exact metric terms, and the evaluation reference is a Jacobi solve of the
same discrete operator.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci

H = 0.01
PAD = 1


def _d_xi(f, h):
    import jax.numpy as jnp

    internal = (-f[..., 4:] + 8 * f[..., 3:-1] - 8 * f[..., 1:-3] + f[..., 0:-4]) / 12 / h
    left = (-11 * f[..., 0:-3] + 18 * f[..., 1:-2] - 9 * f[..., 2:-1] + 2 * f[..., 3:]) / 6 / h
    right = (11 * f[..., 3:] - 18 * f[..., 2:-1] + 9 * f[..., 1:-2] - 2 * f[..., 0:-3]) / 6 / h
    return jnp.concatenate([left[..., 0:2], internal, right[..., -2:]], -1)


def _d_eta(f, h):
    import jax.numpy as jnp

    internal = (-f[..., 4:, :] + 8 * f[..., 3:-1, :] - 8 * f[..., 1:-3, :] + f[..., 0:-4, :]) / 12 / h
    low = (-11 * f[..., 0:-3, :] + 18 * f[..., 1:-2, :] - 9 * f[..., 2:-1, :] + 2 * f[..., 3:, :]) / 6 / h
    up = (11 * f[..., 3:, :] - 18 * f[..., 2:-1, :] + 9 * f[..., 1:-2, :] - 2 * f[..., 0:-3, :]) / 6 / h
    return jnp.concatenate([low[..., 0:2, :], internal, up[..., -2:, :]], -2)


def dfdx(f, dydeta, dydxi, jinv, h=H):
    """d/dx on the curvilinear grid (reference utils.py:9-93)."""
    return jinv * (_d_xi(f, h) * dydeta - _d_eta(f, h) * dydxi)


def dfdy(f, dxdxi, dxdeta, jinv, h=H):
    """d/dy on the curvilinear grid (reference utils.py:96-178)."""
    return jinv * (_d_eta(f, h) * dxdxi - _d_xi(f, h) * dxdeta)


def _annulus_mesh(ny=19, nx=84, r_in=1.0, r_out=2.0):
    """Quarter annulus: xi = angle, eta = radius; exact metric terms."""
    h = H
    xi = np.arange(nx) * h
    eta = np.arange(ny) * h
    th0, th1 = 0.0, np.pi / 2
    theta = th0 + (th1 - th0) * xi / xi[-1]
    r = r_in + (r_out - r_in) * eta / eta[-1]
    R, TH = np.meshgrid(r, theta, indexing="ij")  # (ny, nx)
    x = R * np.cos(TH)
    y = R * np.sin(TH)
    dth_dxi = (th1 - th0) / xi[-1]
    dr_deta = (r_out - r_in) / eta[-1]
    dxdxi = -R * np.sin(TH) * dth_dxi
    dydxi = R * np.cos(TH) * dth_dxi
    dxdeta = np.cos(TH) * dr_deta
    dydeta = np.sin(TH) * dr_deta
    jac = dxdxi * dydeta - dxdeta * dydxi
    jinv = 1.0 / jac
    f32 = lambda a: a[None, None].astype("float32")  # (1, 1, ny, nx)
    coords = np.concatenate([x[None, None], y[None, None]], 1).astype("float32")
    return dict(coords=coords, jinvs=f32(jinv), dxdxis=f32(dxdxi), dydxis=f32(dydxi),
                dxdetas=f32(dxdeta), dydetas=f32(dydeta))


def load_data(data_dir):
    if data_dir and osp.exists(data_dir):
        data = np.load(data_dir)
        return {k: data[k] for k in ("coords", "jinvs", "dxdxis", "dydxis", "dxdetas", "dydetas")}
    print(f"[phygeonet] {data_dir!r} absent -> analytic quarter-annulus mesh")
    return _annulus_mesh()


def _apply_bc(v):
    """Dirichlet frame (reference heat_equation.py:71-77): outer eta edge 0,
    the other three edges 1, corner averaging."""
    v = v.at[:, 0, -PAD:, PAD:-PAD].set(0)
    v = v.at[:, 0, :PAD, PAD:-PAD].set(1)
    v = v.at[:, 0, PAD:-PAD, -PAD:].set(1)
    v = v.at[:, 0, PAD:-PAD, 0:PAD].set(1)
    v = v.at[:, 0, 0, 0].set(0.5 * (v[:, 0, 0, 1] + v[:, 0, 1, 0]))
    v = v.at[:, 0, 0, -1].set(0.5 * (v[:, 0, 0, -2] + v[:, 0, 1, -1]))
    return v


def jacobi_reference(data, iters=20000, r_in=1.0, r_out=2.0):
    """Reference temperature field for the synthetic quarter annulus: Laplace
    in polar coordinates (u_rr + u_r/r + u_tt/r^2 = 0) on the same (r, theta)
    lattice, Jacobi-iterated. Stands in for the reference's OpenFOAM field."""
    ny, nx = data["coords"].shape[-2:]
    r = np.linspace(r_in, r_out, ny)
    th = np.linspace(0, np.pi / 2, nx)
    dr, dth = r[1] - r[0], th[1] - th[0]
    u = np.zeros((ny, nx))
    u[0, :] = 1.0   # inner radius (first eta row): T=1
    u[-1, :] = 0.0  # outer radius: T=0
    u[:, 0] = 1.0
    u[:, -1] = 1.0
    u[-1, 0] = 0.5
    u[-1, -1] = 0.5
    R = r[1:-1][:, None]
    a = 1 / dr**2 + 1 / (2 * R * dr)   # u[i+1]
    b = 1 / dr**2 - 1 / (2 * R * dr)   # u[i-1]
    c = 1 / (R**2 * dth**2)
    diag = 2 / dr**2 + 2 * c
    for _ in range(iters):
        u[1:-1, 1:-1] = (a * u[2:, 1:-1] + b * u[:-2, 1:-1]
                         + c * (u[1:-1, 2:] + u[1:-1, :-2])) / diag
    return u


def build_solver(epochs=1500, output_dir="./outputs_phygeonet", learning_rate=1e-3,
                 data_dir="./dataset/phygeonet/heat_equation.npz", hidden=(16, 32, 16)):
    psci.utils.set_random_seed(42)
    data = load_data(data_dir)
    ny, nx = data["coords"].shape[-2:]
    model = psci.arch.USCNN(
        ("coords",), ("output_v",), hidden_size=list(hidden),
        h=H, nx=nx, ny=ny, nvar_in=2, nvar_out=1, pad_singleside=PAD)

    jinvs = data["jinvs"]
    dxdxis, dydxis = data["dxdxis"], data["dydxis"]
    dxdetas, dydetas = data["dxdetas"], data["dydetas"]

    def transform_out(in_, out):
        import jax.numpy as jnp

        v = _apply_bc(out["output_v"])
        jinv = in_.get("jinvs", jnp.asarray(jinvs))
        ddx = in_.get("dxdxis", jnp.asarray(dxdxis))
        ddy = in_.get("dydxis", jnp.asarray(dydxis))
        dde_x = in_.get("dxdetas", jnp.asarray(dxdetas))
        dde_y = in_.get("dydetas", jnp.asarray(dydetas))
        dvdx = dfdx(v, dde_y, ddy, jinv)
        d2vdx2 = dfdx(dvdx, dde_y, ddy, jinv)
        dvdy = dfdy(v, ddx, dde_x, jinv)
        d2vdy2 = dfdy(dvdy, ddx, dde_x, jinv)
        continuity = d2vdx2 + d2vdy2
        return {"residual": jnp.mean(continuity**2)[None, None], "output_v": v}

    model.register_output_transform(transform_out)

    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {k: data[k] for k in ("coords", "jinvs", "dxdxis", "dydxis",
                                                    "dxdetas", "dydetas")}},
         "batch_size": 1, "iters_per_epoch": 1,
         "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.FunctionalLoss(lambda out, label, weight: {"residual": out["residual"].sum()}),
        {"residual": lambda out: out["residual"], "output_v": lambda out: out["output_v"]},
        name="residual",
    )
    optimizer = psci.optimizer.Adam(learning_rate)(model)
    solver = psci.solver.Solver(
        model, {"residual": sup}, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=1, eval_during_train=False)
    return solver, data


def evaluate_field(solver, data, ref=None):
    import jax.numpy as jnp

    out = solver.predict({k: data[k] for k in ("coords", "jinvs", "dxdxis", "dydxis",
                                               "dxdetas", "dydetas")},
                         batch_size=1, return_numpy=True)
    v = out["output_v"][0, 0]
    if ref is None:
        ref = jacobi_reference(data)
    ev = float(np.sqrt(np.mean((ref - v) ** 2) / np.mean(ref**2)))
    print(f"phygeonet ev (rel L2 vs discrete reference) = {ev:.4f}")
    return ev


# ---- parametric-BC variant (reference heat_equation_with_bc.py) -----------

def _full_annulus_mesh(ny=19, nx=84, r_in=1.0, r_out=2.0):
    """Full annulus: xi = angle (periodic), eta = radius; exact metric terms."""
    h = H
    xi = np.arange(nx) * h
    eta = np.arange(ny) * h
    theta = 2 * np.pi * xi / (xi[-1] + (xi[1] - xi[0]))  # endpoint excluded
    r = r_in + (r_out - r_in) * eta / eta[-1]
    R, TH = np.meshgrid(r, theta, indexing="ij")
    x, y = R * np.cos(TH), R * np.sin(TH)
    dth_dxi = (theta[1] - theta[0]) / (xi[1] - xi[0])
    dr_deta = (r_out - r_in) / eta[-1]
    dxdxi = -R * np.sin(TH) * dth_dxi
    dydxi = R * np.cos(TH) * dth_dxi
    dxdeta = np.cos(TH) * dr_deta
    dydeta = np.sin(TH) * dr_deta
    jinv = 1.0 / (dxdxi * dydeta - dxdeta * dydxi)
    f32 = lambda a: a[None, None].astype("float32")
    coords = np.concatenate([x[None, None], y[None, None]], 1).astype("float32")
    return dict(coords=coords, jinvs=f32(jinv), dxdxis=f32(dxdxi), dydxis=f32(dydxi),
                dxdetas=f32(dxdeta), dydetas=f32(dydeta))


def build_solver_bc(epochs=1500, output_dir="./outputs_phygeonet_bc",
                    learning_rate=1e-3, paras=(1, 2, 3, 4, 5, 6, 7),
                    hidden=(16, 32, 16)):
    """Parameterized-BC family (reference ``heat_equation_with_bc.py``): the
    input image is the BC value broadcast over the grid (the reference feeds
    ``paras`` under the "coords" key, nvar_in=1), the model learns T(r;para)
    for para in 1..7 on a full annulus — inner edge T=para, outer T=0,
    periodic in theta (the reference's row-wrap frame copies)."""
    psci.utils.set_random_seed(42)
    data = _full_annulus_mesh()
    ny, nx = data["coords"].shape[-2:]
    paras = np.asarray(paras, "float32")
    para_imgs = np.ones((len(paras), 1, ny, nx), "float32") * paras[:, None, None, None]
    model = psci.arch.USCNN(
        ("para",), ("output_v",), hidden_size=list(hidden),
        h=H, nx=nx, ny=ny, nvar_in=1, nvar_out=1, pad_singleside=PAD)

    jinvs, dxdxis, dydxis = data["jinvs"], data["dxdxis"], data["dydxis"]
    dxdetas, dydetas = data["dxdetas"], data["dydetas"]

    def transform_out(in_, out):
        import jax.numpy as jnp

        v = out["output_v"]
        para = in_["para"][:, :, 0:1, 0:1]
        # Dirichlet in eta (radius): inner = para, outer = 0
        v = v.at[:, :, :PAD, :].set(para * jnp.ones_like(v[:, :, :PAD, :]))
        v = v.at[:, :, -PAD:, :].set(0.0)
        # periodic in xi (theta): wrap frame columns (reference's row copies)
        v = v.at[:, :, :, 0:PAD].set(v[:, :, :, -2 * PAD : -PAD])
        v = v.at[:, :, :, -PAD:].set(v[:, :, :, PAD : 2 * PAD])
        jinv = jnp.asarray(jinvs)
        dvdx = dfdx(v, jnp.asarray(dydetas), jnp.asarray(dydxis), jinv)
        d2vdx2 = dfdx(dvdx, jnp.asarray(dydetas), jnp.asarray(dydxis), jinv)
        dvdy = dfdy(v, jnp.asarray(dxdxis), jnp.asarray(dxdetas), jinv)
        d2vdy2 = dfdy(dvdy, jnp.asarray(dxdxis), jnp.asarray(dxdetas), jinv)
        return {"residual": jnp.mean((d2vdx2 + d2vdy2) ** 2)[None, None], "output_v": v}

    model.register_output_transform(transform_out)
    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset", "input": {"para": para_imgs}},
         "batch_size": len(paras), "iters_per_epoch": 1,
         "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.FunctionalLoss(lambda out, label, weight: {"residual": out["residual"].sum()}),
        {"residual": lambda out: out["residual"], "output_v": lambda out: out["output_v"]},
        name="residual",
    )
    solver = psci.solver.Solver(
        model, {"residual": sup}, output_dir, psci.optimizer.Adam(learning_rate)(model),
        epochs=epochs, iters_per_epoch=1, eval_during_train=False)
    return solver, (para_imgs, data)


def evaluate_field_bc(solver, aux, r_in=1.0, r_out=2.0):
    """Analytic check: T(r; para) = para ln(r_out/r) / ln(r_out/r_in)."""
    para_imgs, data = aux
    out = solver.predict({"para": para_imgs}, batch_size=len(para_imgs),
                         return_numpy=True)
    v = out["output_v"][:, 0]  # (P, ny, nx)
    ny = v.shape[1]
    r = np.linspace(r_in, r_out, ny)
    truth = (para_imgs[:, 0, 0, 0][:, None]
             * np.log(r_out / r)[None, :] / np.log(r_out / r_in))
    truth = np.repeat(truth[:, :, None], v.shape[2], axis=2)
    ev = float(np.sqrt(np.mean((truth - v) ** 2) / np.mean(truth**2)))
    print(f"phygeonet_bc ev (rel L2 vs analytic log profile) = {ev:.4f}")
    return ev


def main_cli():
    import _runner

    @psci.utils.config.main("conf/phygeonet.yaml")
    def _main(cfg):
        def train(c):
            solver, data = _runner.build_from_cfg(c, build_solver)
            solver.train()
            return evaluate_field(solver, data)

        def evaluate(c):
            solver, data = _runner.build_from_cfg(c, build_solver)
            path = c.get_path("EVAL.pretrained_model_path")
            if path:
                solver.load_pretrain(path)
            return evaluate_field(solver, data)

        return psci.utils.config.dispatch(cfg, train=train, evaluate=evaluate)

    return _main()


if __name__ == "__main__":
    main_cli()
