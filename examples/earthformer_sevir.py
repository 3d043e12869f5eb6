"""Earthformer on SEVIR radar nowcasting (reference
``examples/earthformer/earthformer_sevir_train.py`` + ``sevir_metric.py``).

CuboidTransformer maps in_len VIL frames to the next out_len. Alongside MSE,
evaluation reports the SEVIR challenge skill scores (CSI / POD / SUCR / BIAS
accumulated over the standard thresholds 16..219 in raw 0-255 VIL units,
reference ``sevir_metric.py:36-228``) — computed here as one vectorized jnp
pass over a stacked threshold axis instead of a per-threshold Python loop, so
the whole score traces into the jitted eval step. The SEVIR archive is not
downloadable in this environment; ``SEVIRDataset`` synthesizes advecting-cell
sequences unless ``data_dir`` points at a real CATALOG.csv layout.
"""

import paddlescience_tpu as psci

IN_LEN, OUT_LEN, H, W = 8, 6, 32, 32  # (reference 13->12 at 384x384; tiny here; T divisible by cuboid_t=2)
# raw-unit VIL thresholds (reference sevir_metric.py:77)
THRESHOLDS = (16, 74, 133, 160, 181, 219)
_VIL_SCALE, _VIL_OFFSET = 1 / 47.54, -33.44  # sevir_dataset.py:33-45


def sevir_skill_scores(output_dict, label_dict):
    """csi/pod/sucr/bias per threshold + averages (reference
    ``sevir_metric.py:SEVIRSkillScore`` mode "0": hits/misses/fas cumulated
    over all pixels, score averaged over thresholds)."""
    import jax.numpy as jnp

    pred, target = output_dict["vil"], label_dict["vil"]
    # invert the dataset preprocess x_norm = scale*(x+offset) back to 0-255
    pred = pred / _VIL_SCALE - _VIL_OFFSET
    target = target / _VIL_SCALE - _VIL_OFFSET
    thr = jnp.asarray(THRESHOLDS, pred.dtype).reshape(-1, *([1] * pred.ndim))
    t = (target[None] >= thr).astype(pred.dtype)
    p = (pred[None] >= thr).astype(pred.dtype)
    axes = tuple(range(1, t.ndim))
    hits = jnp.sum(t * p, axes)
    misses = jnp.sum(t * (1 - p), axes)
    fas = jnp.sum((1 - t) * p, axes)
    eps = 1e-4
    scores = {
        "csi": hits / (hits + misses + fas + eps),
        "pod": hits / (hits + misses + eps),
        "sucr": hits / (hits + fas + eps),
        "bias": ((hits + fas) / (hits + misses + eps) / jnp.log(2.0)) ** 2,
    }
    out = {}
    for name, s in scores.items():
        for i, th in enumerate(THRESHOLDS):
            out[f"{name}_{th}"] = s[i]
        out[f"{name}_avg"] = jnp.mean(s)
    return out


def build_solver(epochs=3, output_dir="./output_earthformer_sevir",
                 data_dir=None, batch_size=2, lr=1e-3):
    psci.utils.set_random_seed(0)
    model = psci.arch.CuboidTransformer(
        ("vil",), ("vil_out",),
        input_shape=(IN_LEN, H, W, 1),
        target_shape=(OUT_LEN, H, W, 1),
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
        "dataset": {"name": "SEVIRDataset", "input_keys": ("vil",), "label_keys": ("vil",),
                    "data_dir": data_dir, "data_types": ("vil",),
                    "in_len": IN_LEN, "out_len": OUT_LEN,
                    "img_height": H, "img_width": W, "num_events": 6,
                    "synthetic": data_dir is None},
        "batch_size": batch_size,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    expr = {"vil": lambda out: out["vil_out"]}
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"), expr, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"), expr,
        metric={"rmse": psci.metric.RMSE(),
                "skill": psci.metric.FunctionalMetric(sevir_skill_scores)},
        name="sevir_valid")
    lr_sched = psci.optimizer.lr_scheduler.Cosine(
        epochs=epochs, iters_per_epoch=3, learning_rate=lr, warmup_epoch=1)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.AdamW(lr_sched, weight_decay=1e-5)(model),
        epochs=epochs, iters_per_epoch=3,
        validator={"sevir_valid": validator}, eval_during_train=False, log_freq=3)


def main_cli():
    import _runner

    @psci.utils.config.main("conf/earthformer_sevir.yaml")
    def _main(cfg):
        def build(c):
            return build_solver(
                epochs=c.TRAIN.epochs,
                output_dir=(c.get("output_dir") or "./output_earthformer_sevir"),
                data_dir=c.get_path("data_dir"),
                batch_size=c.TRAIN.batch_size,
                lr=c.TRAIN.learning_rate,
            )

        return _runner.run(cfg, build)

    return _main()


if __name__ == "__main__":
    main_cli()
