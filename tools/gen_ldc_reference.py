"""Generate lid-driven-cavity reference fields for the LDC examples.

The reference examples consume ``./data/ldc_Re{Re}.mat`` files with keys
u, v (nx, ny) and x, y grid vectors (``/root/reference/examples/ldc/
ldc_2d_Re3200_piratenet.py:94-99``) downloaded from the PaddleScience
bucket. This sandbox has zero egress, so the ground truth is generated
in-repo by a classical solver — the same role the upstream .mat files play
(they too come from a numerical solver).

Method: vorticity-streamfunction formulation on a uniform grid,
  psi: laplace(psi) = -omega   (DST-I fast Poisson solve, Dirichlet psi=0)
  omega_t + u omega_x + v omega_y = (1/Re) laplace(omega)
pseudo-time marched to steady state (Heun RK2) with Arakawa's conservative
9-point Jacobian for convection + central diffusion and Thom's
wall-vorticity closure; regularized lid
u_lid(x) = 1 - cosh(50(x-1/2))/cosh(25) matching the PINN BC
(``ldc_2d_Re3200_piratenet.py:142``) so the reference field and the PINN
solve the same problem.

Sanity anchors (--lid uniform, validated): min(psi) = -0.10340 at Re=100
(Ghia -0.10342) and -0.11722 at Re=1000 on 129^2 (Ghia -0.11793 — the gap
is grid resolution; production runs use 257^2). The regularized lid gives
slightly shallower values.

Usage: python tools/gen_ldc_reference.py [--re 100 400 1000 3200]
       [--n 257] [--steps auto] [--out dataset/]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dst1(x, axis):
    """DST-I along axis via odd-extension rFFT (O(N log N))."""
    import jax.numpy as jnp

    n = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    ext = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,)), x, jnp.zeros(x.shape[:-1] + (1,)), -x[..., ::-1]],
        axis=-1,
    )  # length 2n+2 odd extension
    F = jnp.fft.rfft(ext, axis=-1)
    out = -F.imag[..., 1 : n + 1]
    return jnp.moveaxis(out, -1, axis)


def poisson_dst(rhs, h):
    """Solve laplace(p) = rhs with p=0 on the boundary of a uniform grid.
    rhs: (n-2, n-2) interior values."""
    import jax.numpy as jnp

    m = rhs.shape[0]
    k = jnp.arange(1, m + 1)
    lam = (2.0 * (jnp.cos(jnp.pi * k / (m + 1)) - 1.0)) / (h * h)
    rhat = dst1(dst1(rhs, 0), 1)
    phat = rhat / (lam[:, None] + lam[None, :])
    # dst1 here computes 2x the unitary-free DST-I (odd-extension FFT), and
    # DST-I squared is (m+1)/2 * I, so a forward+inverse pair per axis
    # contributes 4 * (m+1)/2 = 2(m+1)
    p = dst1(dst1(phat, 0), 1)
    return p / (2.0 * (m + 1)) ** 2


def solve_cavity(Re: float, n: int = 257, lid: str = "regularized",
                 steps: int = None, tol: float = 1e-7, report=print):
    """March to steady state; returns dict(u, v, psi, omega, x, y)."""
    import jax
    import jax.numpy as jnp

    h = 1.0 / (n - 1)
    x = np.linspace(0.0, 1.0, n)
    if lid == "regularized":
        u_lid = 1.0 - np.cosh(50.0 * (x - 0.5)) / np.cosh(25.0)
    else:
        u_lid = np.ones_like(x)
    u_lid = jnp.asarray(u_lid)

    dt_conv = 0.4 * h  # Heun + central advection: keep CFL conservative
    dt_diff = 0.2 * h * h * Re
    dt = float(min(dt_conv, dt_diff))
    if steps is None:
        # spin-up to steady state slows with Re; convergence is also
        # checked on psi below so this is an upper bound
        steps = int(min(max(300.0, 0.6 * Re), 2400.0) / dt)

    def arakawa(a, b):
        """Arakawa's 9-point Jacobian J(a,b) = a_x b_y - a_y b_x on the
        interior — 2nd-order, energy/enstrophy conserving, so convection
        adds NO numerical viscosity (1st-order upwind's artificial
        viscosity u*h/2 ~ 2e-3 would swamp nu = 1/Re at Re >= 1000)."""
        j1 = ((a[2:, 1:-1] - a[:-2, 1:-1]) * (b[1:-1, 2:] - b[1:-1, :-2])
              - (a[1:-1, 2:] - a[1:-1, :-2]) * (b[2:, 1:-1] - b[:-2, 1:-1]))
        j2 = (a[2:, 1:-1] * (b[2:, 2:] - b[2:, :-2])
              - a[:-2, 1:-1] * (b[:-2, 2:] - b[:-2, :-2])
              - a[1:-1, 2:] * (b[2:, 2:] - b[:-2, 2:])
              + a[1:-1, :-2] * (b[2:, :-2] - b[:-2, :-2]))
        j3 = (a[2:, 2:] * (b[1:-1, 2:] - b[2:, 1:-1])
              - a[:-2, :-2] * (b[:-2, 1:-1] - b[1:-1, :-2])
              - a[:-2, 2:] * (b[1:-1, 2:] - b[:-2, 1:-1])
              + a[2:, :-2] * (b[2:, 1:-1] - b[1:-1, :-2]))
        return (j1 + j2 + j3) / (12.0 * h * h)

    def rhs(omega):
        """omega_t = J(psi, omega) + lap(omega)/Re with Thom wall closure."""
        p_int = poisson_dst(-omega[1:-1, 1:-1], h)
        psi = jnp.zeros_like(omega).at[1:-1, 1:-1].set(p_int)
        omega = omega.at[0, :].set(-2.0 * psi[1, :] / h**2)
        omega = omega.at[-1, :].set(-2.0 * psi[-2, :] / h**2)
        omega = omega.at[:, 0].set(-2.0 * psi[:, 1] / h**2)
        omega = omega.at[:, -1].set(-2.0 * psi[:, -2] / h**2 - 2.0 * u_lid / h)
        oc = omega[1:-1, 1:-1]
        lap = (omega[2:, 1:-1] + omega[:-2, 1:-1] + omega[1:-1, 2:] + omega[1:-1, :-2]
               - 4.0 * oc) / (h * h)
        return arakawa(psi, omega) + lap / Re, omega, psi

    def step(state, _):
        omega, _ = state
        # Heun RK2 on the interior; walls re-closed inside rhs
        f1, omega_bc, psi = rhs(omega)
        o1 = omega_bc.at[1:-1, 1:-1].add(dt * f1)
        f2, o1_bc, _ = rhs(o1)
        new_int = omega_bc[1:-1, 1:-1] + 0.5 * dt * (f1 + f2)
        omega_new = o1_bc.at[1:-1, 1:-1].set(new_int)
        return (omega_new, psi), jnp.max(jnp.abs(new_int - omega_bc[1:-1, 1:-1]))

    omega = jnp.zeros((n, n))
    psi = jnp.zeros((n, n))

    chunk = 2000
    scan = jax.jit(lambda s: jax.lax.scan(step, s, None, length=chunk))
    state = (omega, psi)
    done = 0
    psi_prev = np.asarray(psi)
    while done < steps:
        state, deltas = scan(state)
        done += chunk
        psi_now = np.asarray(state[1])
        dpsi = float(np.abs(psi_now - psi_prev).max()) / (chunk * dt)
        psi_prev = psi_now
        if done % 20000 == 0 or dpsi < tol:
            report(f"Re={Re} n={n}: step {done}/{steps} dpsi/dt {dpsi:.3e} "
                   f"psi_min {psi_now.min():.6f}")
        if dpsi < tol:
            break
    omega, psi = state
    # final velocities
    u = np.zeros((n, n))
    v = np.zeros((n, n))
    psi_np = np.asarray(psi)
    u[1:-1, 1:-1] = (psi_np[1:-1, 2:] - psi_np[1:-1, :-2]) / (2 * h)
    v[1:-1, 1:-1] = -(psi_np[2:, 1:-1] - psi_np[:-2, 1:-1]) / (2 * h)
    u[:, -1] = np.asarray(u_lid)
    return {"u": u.astype(np.float32), "v": v.astype(np.float32),
            "psi": psi_np.astype(np.float32), "omega": np.asarray(omega, np.float32),
            "x": x.astype(np.float32), "y": x.astype(np.float32)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, nargs="+", default=[100.0, 400.0, 1000.0, 1600.0, 3200.0])
    ap.add_argument("--n", type=int, default=257)
    ap.add_argument("--lid", default="regularized", choices=["regularized", "uniform"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dataset"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for Re in args.re:
        fields = solve_cavity(Re, n=args.n, lid=args.lid, steps=args.steps)
        tag = int(Re) if float(Re).is_integer() else Re
        path = os.path.join(args.out, f"ldc_Re{tag}.npz")
        np.savez(path, **fields)
        print(f"wrote {path}  psi_min={fields['psi'].min():.6f}")


if __name__ == "__main__":
    main()
