"""PhyCRNet for the 2-D Burgers equations (reference
``examples/phycrnet/main.py``).

Physics-encoded convolutional-recurrent net: encoder + ConvLSTM + pixel
shuffle with a hard Euler step u_{t+1} = u_t + dt * f(u_t). The loss is the
finite-difference PDE residual of the rolled-out trajectory (physics-only
training, no labels) — reference uses fixed FD kernels; here the same
5-point Laplacian/central-difference stencils via jnp convolutions.
"""

import sys

import numpy as np

import paddlescience_tpu as psci

H = W = 32
DT, NU = 0.002, 0.01


def _initial_field(seed=0):
    rng = np.random.default_rng(seed)
    k = np.fft.fftfreq(H, 1.0 / H)
    KX, KY = np.meshgrid(k, k, indexing="ij")
    spec = (rng.normal(size=(2, H, W)) + 1j * rng.normal(size=(2, H, W)))
    spec *= ((KX**2 + KY**2) <= 25).astype(float)
    f = np.real(np.fft.ifft2(spec, axes=(-2, -1)))
    f = f / (np.abs(f).max() + 1e-9)
    return f[None].astype(np.float32)  # (1, 2, H, W)


def main(steps=60):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    model = psci.arch.PhyCRNet(
        input_channels=2, hidden_channels=(8, 32, 32, 128),
        input_kernel_size=(4, 4, 4, 3), input_stride=(2, 2, 2, 1),
        input_padding=(1, 1, 1, 1), dt=DT, num_layers=(3, 1),
        upscale_factor=8, step=4, effective_step=tuple(range(4)))
    u0 = jnp.asarray(_initial_field())
    params = model.param_tree()
    tx = optax.adam(2e-3)
    opt = tx.init(params)
    dx = 1.0 / H

    from paddlescience_tpu.arch.phycrnet import loss_generator

    lg = loss_generator(dt=DT, dx=dx)

    def fd_residual(u_seq):
        """Burgers residual via the reference's 4th-order FD kernels
        (phycrnet.py loss_generator; R = 1/NU)."""
        roll = jnp.stack([u[0] for u in u_seq], 0)  # (T, 2, H, W)
        f_u, f_v = lg.get_phy_loss(roll, R=1.0 / NU)
        return jnp.mean(f_u**2) + jnp.mean(f_v**2)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, {"initial_state": None, "input": u0})
            return fd_residual([u0] + list(out["outputs"]))
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for it in range(steps):
        params, opt, loss = step(params, opt)
        if it == 0:
            first = float(loss)
        last = float(loss)
    print(f"PhyCRNet Burgers residual: {first:.2f} -> {last:.2f} over {steps} steps")
    assert last < first
    return last
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/phycrnet_burgers.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps))

    return _main()


if __name__ == "__main__":
    main_cli()
