"""EPNN: elasto-plastic constitutive neural network (reference
``examples/epnn/epnn.py``).

Two coupled MLPs learn the state evolution (elastic strain ratio) and
stress update from strain increments. Granular-material dataset is not
downloadable; we synthesize a 1-D elastic-perfectly-plastic law (E=2,
yield=0.5) which exhibits the path dependence EPNN is built for.
"""

import sys

import numpy as np

import paddlescience_tpu as psci


def _synthetic_paths(n=256, seed=0):
    """Random strain increments -> (stress, elastic-strain) via return mapping."""
    rng = np.random.default_rng(seed)
    E, YIELD = 2.0, 0.5
    eps = rng.uniform(-0.4, 0.4, n)
    deps = rng.uniform(-0.1, 0.1, n)
    sig = np.clip(E * eps, -YIELD, YIELD)  # current stress on/inside yield surface
    sig_new = np.clip(sig + E * deps, -YIELD, YIELD)
    x = np.stack([eps, sig, deps], 1).astype(np.float32)
    y = (sig_new - sig).astype(np.float32)[:, None]
    return {"state": x}, {"dstress": y}


def build_solver(epochs=6, output_dir="./output_epnn"):
    psci.utils.set_random_seed(0)
    model = psci.arch.Epnn(
        ("state",), ("dstress",),
        node_sizes=(3, 64, 64, 1),
        activations=("leaky_relu", "leaky_relu"),
    )
    inp, lab = _synthetic_paths()
    dl = {
        "dataset": {"name": "NamedArrayDataset", "input": inp, "label": lab},
        "batch_size": 64,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"), {"dstress": lambda out: out["dstress"]}, name="Sup")
    validator = psci.validate.SupervisedValidator(
        {**dl, "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
        psci.loss.MSELoss("mean"), metric={"MAE": psci.metric.MAE()}, name="epnn_valid")
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(2e-3)(model),
        epochs=epochs, iters_per_epoch=4,
        validator={"epnn_valid": validator}, eval_during_train=False, log_freq=8)
def main_cli():
    import paddlescience_tpu as psci

    import _runner

    @psci.utils.config.main("conf/epnn_elastoplastic.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
