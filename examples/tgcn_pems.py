"""TGCN traffic-flow forecasting on PEMS (reference
``examples/tgcn/tgcn.py`` + ``ppsci/arch/tgcn.py``).

Temporal GCN (graph convolution over the sensor network + GRU over time)
predicting the next reading from a 12-step window. PEMS archives are not
downloadable; PEMSDataset synthesizes daily-periodic sensor series and the
adjacency is a ring-of-sensors graph.
"""

import sys

import numpy as np

import paddlescience_tpu as psci

NUM_NODES, IN_LEN = 16, 12


def build_solver(epochs=4, output_dir="./output_tgcn_pems"):
    psci.utils.set_random_seed(0)
    # ring adjacency: each sensor connected to its neighbors
    adj = np.zeros((NUM_NODES, NUM_NODES), np.float32)
    for i in range(NUM_NODES):
        adj[i, (i + 1) % NUM_NODES] = adj[(i + 1) % NUM_NODES, i] = 1.0

    model = psci.arch.TGCN(("input",), ("label",), adj=adj, in_dim=1,
                           hidden=32, gcn_hidden=32, out_steps=1)

    class AddChannel:
        """(B, T, N) -> (B, T, N, 1) input; label -> (B, N, 1) first step."""

        def __call__(self, inp, lab, wgt):
            x = np.asarray(inp["input"])[..., None]
            y = np.asarray(lab["label"])[:, 0, :, None]
            return {"input": x}, {"label": y}, wgt

    dl = {
        "dataset": {"name": "PEMSDataset", "input_keys": ("input",), "label_keys": ("label",),
                    "num_nodes": NUM_NODES, "input_len": IN_LEN, "label_len": 1,
                    "transforms": AddChannel()},
        "batch_size": 32,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"), {"label": lambda out: out["label"]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "dataset": {**dl["dataset"], "split": "val"},
         "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"),
        metric={"MAE": psci.metric.MAE(), "RMSE": psci.metric.RMSE()}, name="pems_valid")
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=10,
        validator={"pems_valid": validator}, eval_during_train=False, log_freq=10)
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/tgcn_pems.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
