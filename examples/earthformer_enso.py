"""Earthformer on ENSO SST prediction (reference
``examples/earthformer/earthformer_enso_train.py``).

CuboidTransformer maps 12 months of SST (T_in, lat, lon, 1) to the next 26
(14 effective after the reference's 12-step overlap). The CMIP/SODA archive
is not downloadable here; ENSODataset falls back to smooth spectral SST
fields. Exercises cuboid attention + the windowed climate dataset + RMSE.
"""

import sys

import numpy as np

import paddlescience_tpu as psci

IN_LEN, OUT_LEN, LAT, LON = 6, 4, 16, 32


def build_solver(epochs=3, output_dir="./output_earthformer_enso"):
    psci.utils.set_random_seed(0)
    model = psci.arch.CuboidTransformer(
        ("sst",), ("target",),
        input_shape=(IN_LEN, LAT, LON, 1),
        target_shape=(OUT_LEN, LAT, LON, 1),
        base_units=32, num_heads=4, enc_depth=(1, 1), dec_depth=(1, 1),
        cuboid_size=(2, 4, 4),
        # reference default attention patterns (cuboid_transformer.py:560-562)
        self_pattern="axial", cross_self_pattern="axial", cross_pattern="cross_1x1",
        # reference training regularization (cuboid_transformer.py:516-517 /
        # extformer_moe_enso_pretrain.yaml:79-81): dropout active whenever the
        # solver installs a per-step train RNG
        attn_drop=0.1, proj_drop=0.1, ffn_drop=0.1,
    )
    dl = {
        "dataset": {"name": "ENSODataset", "input_keys": ("sst",), "label_keys": ("target",),
                    "in_len": IN_LEN, "out_len": OUT_LEN, "lat": LAT, "lon": LON},
        "batch_size": 4,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"), {"target": lambda out: out["target"]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"), metric={"RMSE": psci.metric.RMSE()}, name="enso_valid")
    lr = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=3, learning_rate=2e-3, warmup_epoch=1)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.AdamW(lr, weight_decay=1e-5)(model),
        epochs=epochs, iters_per_epoch=3,
        validator={"enso_valid": validator}, eval_during_train=False, log_freq=3)
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/earthformer_enso.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
