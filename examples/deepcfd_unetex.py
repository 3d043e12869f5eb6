"""DeepCFD: UNetEx surrogate for steady channel flow around obstacles
(reference ``examples/deepcfd/deepcfd.py``).

Maps (SDF of obstacle, flow-region mask, SDF of walls) images to (u, v, p)
fields. The OpenFOAM dataset is not downloadable; we synthesize
potential-flow-like fields around random circular obstacles with the same
(N, 3, H, W) -> (N, 3, H, W) tensor contract.
"""

import sys

import numpy as np

import paddlescience_tpu as psci

H = W = 32


def _make_data(n=32, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32) / H
    x_in = np.zeros((n, 3, H, W), np.float32)
    y_out = np.zeros((n, 3, H, W), np.float32)
    for i in range(n):
        cx, cy, r = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7), rng.uniform(0.08, 0.18)
        d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2) - r
        mask = (d > 0).astype(np.float32)
        x_in[i, 0] = d                 # obstacle SDF
        x_in[i, 1] = mask              # flow region
        x_in[i, 2] = np.minimum(yy, 1 - yy)  # wall SDF
        # potential-flow-like surrogate truth
        scale = np.clip(d, 0, None) / (np.abs(d) + r)
        y_out[i, 0] = mask * (1.0 - (r**2) * ((xx - cx) ** 2 - (yy - cy) ** 2) / np.maximum(((xx - cx) ** 2 + (yy - cy) ** 2), 1e-4) ** 2)
        y_out[i, 1] = -mask * (r**2) * 2 * (xx - cx) * (yy - cy) / np.maximum(((xx - cx) ** 2 + (yy - cy) ** 2), 1e-4) ** 2
        y_out[i, 2] = mask * scale
    return x_in, y_out


def build_solver(epochs=4, output_dir="./output_deepcfd"):
    psci.utils.set_random_seed(0)
    x, y = _make_data()
    model = psci.arch.UNetEx("input", "output", in_channel=3, out_channel=3,
                             filters=(8, 16, 32), layers=2)
    dl = {
        "dataset": {"name": "NamedArrayDataset", "input": {"input": x}, "label": {"output": y}},
        "batch_size": 8,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"), {"output": lambda out: out["output"]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"), metric={"MSE": psci.metric.MSE()}, name="cfd_valid")
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=4,
        validator={"cfd_valid": validator}, eval_during_train=False, log_freq=4)
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/deepcfd_unetex.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
