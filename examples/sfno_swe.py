"""Spherical FNO on the rotating shallow-water equations (reference
``examples/neuraloperator/train_sfno.py``).

SFNONet learns the one-step SWE solution operator on the sphere using the
framework's own real spherical harmonics transform (psci.arch.sht — the
reference vendors paddle_harmonics). Data comes from SphericalSWEDataset
(synthetic smooth vorticity/height fields advected one step when the
archive is absent).
"""

import sys

import numpy as np

import paddlescience_tpu as psci

H, W = 16, 32


def build_solver(epochs=4, output_dir="./output_sfno_swe"):
    psci.utils.set_random_seed(0)
    model = psci.arch.SFNONet(
        ("input",), ("output",),
        n_modes=(8, 8), hidden_channels=32,
        in_channels=3, out_channels=3, n_layers=2,
        img_size=(H, W),
    )
    dl = {
        "dataset": {"name": "SphericalSWEDataset", "input_keys": ("input",),
                    "label_keys": ("output",), "num_samples": 16, "H": H, "W": W},
        "batch_size": 4,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.L2RelLoss(), {"output": lambda out: out["output"]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.L2RelLoss(), metric={"L2Rel": psci.metric.L2Rel()}, name="swe_valid")
    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=4, learning_rate=2e-3)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(lr)(model),
        epochs=epochs, iters_per_epoch=4,
        validator={"swe_valid": validator}, eval_during_train=False, log_freq=4)
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/sfno_swe.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
