"""FourCastNet: AFNO autoregressive global weather prediction (reference
``examples/fourcastnet/train_pretrain.py`` + ``train_precip.py``).

Stage 1 trains AFNONet on ERA5-style (T, C, H, W) windows (input t -> t+1);
stage 2 (optional here) wraps it in PrecipNet. The ERA5 archive is not
downloadable in this environment, so ERA5Dataset falls back to an HDF5 file
we synthesize with smooth spectral fields — the training loop, dataset
windowing, LatitudeWeightedACC/RMSE metrics and VisualizerWeather plots are
the reference pipeline.
"""

import os
import sys

import numpy as np

import paddlescience_tpu as psci

IMG_H, IMG_W, CHANNELS = 32, 64, 4


def _make_synthetic_era5(path, T=40):
    """Smooth advecting spectral fields standing in for ERA5 (zero egress)."""
    import h5py

    rng = np.random.default_rng(0)
    spec = rng.normal(size=(CHANNELS, IMG_H, IMG_W)) + 1j * rng.normal(size=(CHANNELS, IMG_H, IMG_W))
    ky = np.abs(np.fft.fftfreq(IMG_H, 1 / IMG_H))[:, None]
    kx = np.abs(np.fft.fftfreq(IMG_W, 1 / IMG_W))[None, :]
    spec *= ((kx**2 + ky**2) <= 16).astype(float)
    frames = []
    f = np.real(np.fft.ifft2(spec))
    for t in range(T):
        frames.append(np.roll(f, shift=t, axis=-1))  # eastward advection
    data = np.stack(frames).astype(np.float32)
    data = (data - data.mean()) / (data.std() + 1e-9)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as h:
        h["fields"] = data
    return path


def build_solver(epochs=4, output_dir="./output_fourcastnet", data_path="./dataset/era5_synth.h5",
                 num_timestamps=1, pretrained_model_path=None):
    """``num_timestamps > 1`` is the finetune stage (reference
    ``train_finetune.py``): the AFNONet rolls out autoregressively and each
    step is supervised against the t+i frame, warm-started from the
    pretrain checkpoint."""
    psci.utils.set_random_seed(1024)
    if not os.path.exists(data_path):
        _make_synthetic_era5(data_path)

    output_keys = tuple(f"output_{i}" for i in range(num_timestamps)) \
        if num_timestamps > 1 else ("output",)
    model = psci.arch.AFNONet(
        ("input",), output_keys,
        img_size=(IMG_H, IMG_W), patch_size=(4, 4),
        in_channels=CHANNELS, out_channels=CHANNELS,
        embed_dim=64, depth=4, num_blocks=4,
        num_timestamps=num_timestamps,
    )

    train_dl = {
        "dataset": {"name": "ERA5Dataset", "file_path": data_path,
                    "input_keys": ("input",), "label_keys": output_keys,
                    "num_label_timestamps": num_timestamps, "size": 32},
        "batch_size": 4,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    expr = {k: (lambda kk: lambda out: out[kk])(k) for k in output_keys}
    sup = psci.constraint.SupervisedConstraint(
        train_dl, psci.loss.L2RelLoss(), expr, name="Sup"
    )

    eval_dl = dict(train_dl)
    eval_dl["sampler"] = {"name": "BatchSampler", "shuffle": False, "drop_last": False}
    validator = psci.validate.SupervisedValidator(
        eval_dl, psci.loss.L2RelLoss(), expr,
        metric={"RMSE": psci.metric.RMSE(), "ACC": psci.metric.LatitudeWeightedACC(num_lat=IMG_H)},
        name="era5_valid",
    )

    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=8, learning_rate=5e-4, warmup_epoch=1
    )()
    solver = psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=8,
        validator={"era5_valid": validator},
        eval_during_train=False, log_freq=8,
    )
    if pretrained_model_path:
        solver.load_pretrain(pretrained_model_path)
    return solver
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/fourcastnet.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
