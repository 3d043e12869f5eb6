"""YingLong-style regional weather inference (reference
``examples/yinglong/predict.py``).

The reference is an INFERENCE-ONLY pipeline around a proprietary pretrained
regional weather transformer (TensorRT engine + time features). This port
reproduces the pipeline shape TPU-natively: an AFNONet backbone (the
FourCastNet operator family) runs a jitted autoregressive rollout over
``rollout_steps`` with sinusoidal time features appended per step, from a
pretrained checkpoint when given (ERA5SampledDataset layout) or a briefly
fitted model otherwise. Reports per-step RMSE of the rollout.
"""

from __future__ import annotations

import numpy as np

import paddlescience_tpu as psci

H, W, C = 32, 64, 2


def time_features(step, h=H, w=W):
    """Sin/cos diurnal features broadcast over the grid (reference
    timefeatures.py)."""
    ang = 2 * np.pi * (step % 24) / 24.0
    return np.stack([np.full((h, w), np.sin(ang), "float32"),
                     np.full((h, w), np.cos(ang), "float32")], -1)


def synth_fields(n=6, t=8, seed=0):
    rng = np.random.default_rng(seed)
    k = np.fft.fftfreq(H)[:, None] ** 2 + np.fft.fftfreq(W)[None, :] ** 2
    amp = 1.0 / (1.0 + 500 * k)
    seqs = []
    for _ in range(n):
        f = np.real(np.fft.ifft2(np.fft.fft2(rng.standard_normal((H, W))) * amp))
        frames = []
        for s in range(t):
            frames.append(np.stack([np.roll(f, s, axis=1), np.roll(f, 2 * s, axis=1)], -1))
        seqs.append(np.stack(frames).astype("float32"))
    return np.stack(seqs)  # (N, T, H, W, C)


def run(rollout_steps=4, fit_steps=40, lr=1e-3, pretrained=None):
    import jax
    import jax.numpy as jnp
    import optax

    psci.utils.set_random_seed(0)
    model = psci.arch.AFNONet(("input",), ("output",), img_size=(H, W),
                              in_channels=C + 2, out_channels=C,
                              patch_size=(4, 4), embed_dim=96, depth=2,
                              num_blocks=4)
    data = synth_fields()
    params = model.param_tree()
    if pretrained:
        from paddlescience_tpu.utils import save_load

        params = save_load.load_pretrain(pretrained, params)
    else:
        tx = optax.adam(lr)
        opt = tx.init(params)
        x = jnp.asarray(np.concatenate(
            [data[:, 0], np.broadcast_to(time_features(0), (len(data), H, W, 2))], -1))
        y = jnp.asarray(data[:, 1])

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                pred = model.apply(p, {"input": x.transpose(0, 3, 1, 2)})["output"]
                return jnp.mean((pred.transpose(0, 2, 3, 1) - y) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt)
            return optax.apply_updates(params, upd), opt, loss

        for _ in range(fit_steps):
            params, opt, loss = step(params, opt)
        print(f"fit loss: {float(loss):.5f}")

    @jax.jit
    def forward(params, frame, tf):
        inp = jnp.concatenate([frame, tf], -1).transpose(0, 3, 1, 2)
        return model.apply(params, {"input": inp})["output"].transpose(0, 2, 3, 1)

    # autoregressive rollout (reference predict.py main loop)
    frame = jnp.asarray(data[:, 0])
    rmses = []
    for s in range(1, rollout_steps + 1):
        tf = jnp.asarray(np.broadcast_to(time_features(s - 1), (len(data), H, W, 2)))
        frame = forward(params, frame, tf)
        rmse = float(jnp.sqrt(jnp.mean((frame - jnp.asarray(data[:, s])) ** 2)))
        rmses.append(rmse)
        print(f"rollout step {s}: RMSE {rmse:.4f}")
    return float(np.mean(rmses))


def main_cli():
    @psci.utils.config.main("conf/yinglong.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg,
            train=lambda c: run(rollout_steps=c.rollout_steps,
                                fit_steps=c.TRAIN.fit_steps,
                                lr=c.TRAIN.learning_rate),
            inference=lambda c: run(rollout_steps=c.rollout_steps,
                                    pretrained=c.get_path("INFER.pretrained_model_path")),
        )

    return _main()


if __name__ == "__main__":
    main_cli()
