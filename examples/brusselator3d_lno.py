"""Laplace Neural Operator for the 3-D Brusselator reaction-diffusion
system (reference ``examples/brusselator3d/brusselator3d.py``).

LNO learns the map from initial concentration to the field at T via
pole-residue transient response in Laplace space. The published dataset is
not downloadable; we generate small reaction-diffusion rollouts with an
explicit FD integrator (the same generator role as the reference's solver).
"""

import sys

import numpy as np

import paddlescience_tpu as psci

NT, NX = 16, 16


def _generate(n=16, seed=0):
    """du/dt = D lap(u) + a - (1+b) u  (linearized Brusselator u-branch)."""
    rng = np.random.default_rng(seed)
    a, b, D = 1.0, 1.7, 0.1
    dt, dx = 0.01, 1.0 / NX
    xs, ys = [], []
    for _ in range(n):
        u = rng.uniform(0.5, 1.5, (NX,)).astype(np.float32)
        traj = [u.copy()]
        for _ in range(NT - 1):
            lap = (np.roll(u, 1) + np.roll(u, -1) - 2 * u) / dx**2
            u = u + dt * (D * lap + a - (1 + b) * u)
            traj.append(u.copy())
        traj = np.stack(traj)  # (NT, NX)
        xs.append(np.broadcast_to(traj[0], (NT, NX)))
        ys.append(traj)
    return (np.asarray(xs, np.float32)[..., None],
            np.asarray(ys, np.float32)[..., None])  # (N, NT, NX, 1)


def main(steps=60):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    x_np, y_np = _generate()
    T = np.linspace(0.01, 0.16, NT, dtype=np.float32)
    model = psci.arch.LNO(("input",), ("output",), width=16, modes=(4, 4),
                          T=T, data=(np.linspace(0, 1, NX, dtype=np.float32),),
                          in_features=1, hidden_features=32)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    params = model.param_tree()
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, {"input": x})["output"]
            return jnp.mean((out - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        params, opt, loss = step(params, opt)
        if it == 0:
            first = float(loss)
        last = float(loss)
    print(f"Brusselator3D LNO MSE: {first:.5f} -> {last:.5f} over {steps} steps")
    assert last < first
    return last
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/brusselator3d_lno.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps))

    return _main()


if __name__ == "__main__":
    main_cli()
