"""TGCN traffic-flow forecasting on PEMS (reference
``examples/tgcn/run.py`` + ``ppsci/arch/tgcn.py``).

Temporal Graph ConvNet (dilated temporal convs + K-hop graph convs)
predicting the next 12 readings from a 12-step window. PEMS archives are
not downloadable; PEMSDataset synthesizes daily-periodic sensor series and
the adjacency is a ring-of-sensors graph.

Recipe matches the reference config (``examples/tgcn/conf/run.yaml``):
L1 training loss, Adam lr 0.01, batch 64, label_len 12, emb 32 / hidden 64,
gc_layer 2 / tc_layer 2 / k_s 3 / dropout 0.25, input standard-scaled and
labels raw, iters_per_epoch from the dataloader length. Reference pins on
the real archives: PEMSD4 MAE 21.48 / PEMSD8 MAE 15.57
(docs/zh/examples/tgcn.md:25-26) at flow scale ~hundreds — the synthetic
series here carry the same scale (base 100-500, noise sigma 10, so the
oracle MAE floor is ~8).
"""

import sys

import numpy as np

import paddlescience_tpu as psci

NUM_NODES, IN_LEN, LABEL_LEN = 16, 12, 12


def build_solver(epochs=100, output_dir="./output_tgcn_pems", num_steps=2880,
                 batch_size=64, learning_rate=0.01):
    psci.utils.set_random_seed(3407)  # reference run.yaml seed
    # ring adjacency: each sensor connected to its neighbors (reference
    # builds a mean-reduced sensor graph from the archive's edge list)
    adj = np.zeros((NUM_NODES, NUM_NODES), np.float32)
    for i in range(NUM_NODES):
        adj[i, (i + 1) % NUM_NODES] = adj[(i + 1) % NUM_NODES, i] = 1.0

    model = psci.arch.TGCN(
        ("input",), ("label",), adj=adj, in_dim=1, emb_dim=32, hidden=64,
        gc_layer=2, tc_layer=2, k_s=3, dropout=0.25, alpha=0.1,
        input_len=IN_LEN, label_len=LABEL_LEN)

    class AddChannel:
        """(B, T, N) -> (B, T, N, 1) for both input and label."""

        def __call__(self, inp, lab, wgt):
            x = np.asarray(inp["input"])[..., None]
            y = np.asarray(lab["label"])[..., None]
            return {"input": x}, {"label": y}, wgt

    def dl(split, steps, shuffle):
        return {
            "dataset": {"name": "PEMSDataset", "input_keys": ("input",), "label_keys": ("label",),
                        "num_nodes": NUM_NODES, "input_len": IN_LEN, "label_len": LABEL_LEN,
                        "num_steps": steps, "split": split, "transforms": AddChannel()},
            "batch_size": batch_size,
            "sampler": {"name": "BatchSampler", "shuffle": shuffle, "drop_last": shuffle},
        }

    sup = psci.constraint.SupervisedConstraint(
        dl("train", num_steps, True), psci.loss.L1Loss("mean"),
        {"label": lambda out: out["label"]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        dl("val", max(num_steps // 5, 4 * (IN_LEN + LABEL_LEN)), False),
        psci.loss.L1Loss("mean"),
        metric={"MAE": psci.metric.MAE(), "RMSE": psci.metric.RMSE()}, name="pems_valid")
    iters = max((num_steps - IN_LEN - LABEL_LEN + 1) // batch_size, 1)
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(learning_rate)(model),
        epochs=epochs, iters_per_epoch=iters,
        validator={"pems_valid": validator}, eval_during_train=True,
        eval_freq=10, log_freq=50)


def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/tgcn_pems.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
