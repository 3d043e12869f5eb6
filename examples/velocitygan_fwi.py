"""VelocityGAN: adversarial full-waveform inversion (reference
``examples/velocityGAN/velocitygan.py``).

Generator maps seismic shot gathers to subsurface velocity maps; the
discriminator scores velocity maps. Trains on FWIDataset's synthetic
layered-velocity data (OpenFWI archives are not downloadable) with the
reference's alternating generator/discriminator recipe via OptimizerList.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def main(steps=60):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ds = psci.data.build_dataset({"name": "FWIDataset", "input_keys": ("data",),
                                  "label_keys": ("label",), "num_samples": 16})
    x = jnp.asarray(ds.input["data"])  # (N, 1, H, W) seismic
    y = jnp.asarray(ds.label["label"])          # (N, 1, H, W) velocity
    x = (x - x.mean()) / (x.std() + 1e-8)
    y = (y - y.mean()) / (y.std() + 1e-8)

    gen = psci.arch.VelocityGenerator(("data",), ("velocity",), in_channels=1, dim=16, out_size=(32, 32))
    disc = psci.arch.VelocityDiscriminator(("velocity",), ("score",), in_channels=1, dim=16)
    g_params, d_params = gen.param_tree(), disc.param_tree()
    g_tx, d_tx = optax.adam(2e-4, b1=0.5), optax.adam(2e-4, b1=0.5)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)

    @jax.jit
    def d_step(d_params, d_opt, g_params):
        def loss_fn(dp):
            fake = gen.apply(g_params, {"data": x})["velocity"]
            s_real = disc.apply(dp, {"velocity": y})["score"]
            s_fake = disc.apply(dp, {"velocity": jax.lax.stop_gradient(fake)})["score"]
            # WGAN-ish hinge loss
            return jnp.mean(jax.nn.relu(1.0 - s_real)) + jnp.mean(jax.nn.relu(1.0 + s_fake))
        loss, g = jax.value_and_grad(loss_fn)(d_params)
        upd, d_opt = d_tx.update(g, d_opt)
        return optax.apply_updates(d_params, upd), d_opt, loss

    @jax.jit
    def g_step(g_params, g_opt, d_params):
        def loss_fn(gp):
            fake = gen.apply(gp, {"data": x})["velocity"]
            s_fake = disc.apply(d_params, {"velocity": fake})["score"]
            l1 = jnp.mean(jnp.abs(fake - y))
            l2 = jnp.mean((fake - y) ** 2)
            return -jnp.mean(s_fake) + 100.0 * l1 + 100.0 * l2, l1
        (loss, l1), g = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        upd, g_opt = g_tx.update(g, g_opt)
        return optax.apply_updates(g_params, upd), g_opt, loss, l1

    first_l1 = last_l1 = None
    for it in range(steps):
        d_params, d_opt, d_loss = d_step(d_params, d_opt, g_params)
        g_params, g_opt, g_loss, l1 = g_step(g_params, g_opt, d_params)
        if it == 0:
            first_l1 = float(l1)
        last_l1 = float(l1)
    print(f"VelocityGAN reconstruction L1: {first_l1:.4f} -> {last_l1:.4f} over {steps} steps")
    assert last_l1 < first_l1
    return last_l1
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/velocitygan_fwi.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps))

    return _main()


if __name__ == "__main__":
    main_cli()
