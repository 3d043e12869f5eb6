"""ExtFormer-MoE on ENSO SST prediction (reference
``examples/extformer_moe/extformer_moe_enso_train.py``).

Cuboid transformer with mixture-of-experts FFN blocks
(``psci.arch.ExtFormerMoECuboid``; dense single-device routing matching the
reference's MoE, SURVEY §2.3) on the windowed ENSO SST task. The CMIP/SODA
archive is replaced by the ENSODataset spectral-SST fallback when absent.
"""

from __future__ import annotations

import paddlescience_tpu as psci

IN_LEN, OUT_LEN, LAT, LON = 6, 4, 16, 32


def build_solver(epochs=3, iters_per_epoch=3, output_dir="./outputs_extformer_moe",
                 base_units=32, num_experts=4, learning_rate=2e-3):
    psci.utils.set_random_seed(0)
    model = psci.arch.ExtFormerMoECuboid(
        ("sst",), ("target",),
        input_shape=(IN_LEN, LAT, LON, 1),
        target_shape=(OUT_LEN, LAT, LON, 1),
        base_units=base_units, num_heads=4, enc_depth=(1, 1), dec_depth=(1, 1),
        cuboid_size=(2, 4, 4),
        # reference default attention patterns (cuboid_transformer.py:560-562)
        self_pattern="axial", cross_self_pattern="axial", cross_pattern="cross_1x1", num_experts=num_experts,
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
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=learning_rate,
        warmup_epoch=1)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.AdamW(lr, weight_decay=1e-5)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator={"enso_valid": validator}, eval_during_train=False, log_freq=3)


def main_cli():
    import _runner

    @psci.utils.config.main("conf/extformer_moe_enso.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
