"""tempoGAN-style adversarial super-resolution of fluid fields
(reference ``examples/tempoGAN/tempoGAN.py`` with the gan.py archs).

Trains the tempoGAN Generator to 4x-super-resolve velocity-magnitude fields
of the built-in LBM cavity flow (ops/lbm.py — the reference downloads smoke
simulation data instead), with the Discriminator providing an adversarial
loss on top of pixel L1. Demonstrates multi-model alternating optimization
(the reference uses two Solvers; here an explicit two-optimizer loop over
the same pure-pytree machinery).
"""

from __future__ import annotations

import sys

import numpy as np

import paddlescience_tpu as psci


def make_lbm_frames(n_frames=16, nx=64, steps_between=50):
    """Generate LBM cavity velocity-magnitude frames (host-side, once)."""
    import jax
    import jax.numpy as jnp

    from paddlescience_tpu.ops import lbm

    nu = 0.1 * nx / 400.0
    tau = 3.0 * nu + 0.5
    f = lbm._equilibrium(jnp.ones((nx, nx)), jnp.zeros((nx, nx)), jnp.zeros((nx, nx)))

    @jax.jit
    def advance(f):
        def body(f, _):
            return lbm.lbm_step_reference(f, tau, 0.1), None

        return jax.lax.scan(body, f, None, length=steps_between)[0]

    frames = []
    for _ in range(n_frames):
        f = advance(f)
        _, ux, uy = lbm._macroscopic(f)
        frames.append(np.asarray(jnp.sqrt(ux**2 + uy**2)))
    frames = np.stack(frames)[:, None]  # (N, 1, H, W)
    return (frames / (np.abs(frames).max() + 1e-9)).astype(np.float32)


def train(epochs=20, n_frames=16, nx=64):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(42)
    hi = make_lbm_frames(n_frames, nx)
    lo = hi[:, :, ::4, ::4]  # 4x downsample

    gen = psci.arch.Generator(
        ("in",), ("out",), 1,
        out_channels_tuple=((16, 16), (16, 16), (16, 1)),
        kernel_sizes_tuple=((3, 3), (3, 3), (3, 3)),
        strides_tuple=((1, 1), (1, 1), (1, 1)),
        use_bns_tuple=((False, False),) * 3,
        acts_tuple=(("relu", None), ("relu", None), ("relu", None)),
    )
    disc = psci.arch.Discriminator(
        ("x",), ("f1", "f2", "score"), 1, (8, 16), 16 * (nx // 4) ** 2, (3, 3), (2, 2),
        (False, False), ("leaky_relu", "leaky_relu"),
    )
    g_params, d_params = gen.param_tree(), disc.param_tree()
    g_tx, d_tx = optax.adam(2e-4), optax.adam(2e-4)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)

    def upsample(lo_batch):
        return jax.image.resize(lo_batch, lo_batch.shape[:2] + (nx, nx), "nearest")

    def gen_forward(gp, lo_batch):
        return gen.apply(gp, {"in": upsample(lo_batch)})["out"]

    def d_score(dp, img):
        return disc.apply(dp, {"x": img})["score"]

    @jax.jit
    def d_step(dp, d_opt, gp, lo_b, hi_b):
        def loss(dp):
            fake = jax.lax.stop_gradient(gen_forward(gp, lo_b))
            s_real = d_score(dp, hi_b)
            s_fake = d_score(dp, fake)
            # non-saturating GAN loss (BCE with logits)
            return jnp.mean(jax.nn.softplus(-s_real)) + jnp.mean(jax.nn.softplus(s_fake))

        l, g = jax.value_and_grad(loss)(dp)
        upd, d_opt = d_tx.update(g, d_opt, dp)
        return optax.apply_updates(dp, upd), d_opt, l

    @jax.jit
    def g_step(gp, g_opt, dp, lo_b, hi_b):
        def loss(gp):
            fake = gen_forward(gp, lo_b)
            adv = jnp.mean(jax.nn.softplus(-d_score(dp, fake)))
            pix = jnp.mean(jnp.abs(fake - hi_b))
            return 5.0 * pix + 0.1 * adv, (pix, adv)

        (l, (pix, adv)), g = jax.value_and_grad(loss, has_aux=True)(gp)
        upd, g_opt = g_tx.update(g, g_opt, gp)
        return optax.apply_updates(gp, upd), g_opt, pix, adv

    lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)
    for epoch in range(epochs):
        d_params, d_opt, d_l = d_step(d_params, d_opt, g_params, lo_j, hi_j)
        g_params, g_opt, pix, adv = g_step(g_params, g_opt, d_params, lo_j, hi_j)
        if (epoch + 1) % max(epochs // 10, 1) == 0:
            print(f"epoch {epoch + 1}: pix L1 {float(pix):.5f}, adv {float(adv):.4f}, d {float(d_l):.4f}")
    return float(pix)
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/tempogan_lite.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: train(c.TRAIN.epochs))

    return _main()


if __name__ == "__main__":
    main_cli()
