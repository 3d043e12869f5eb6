"""Allen-Cahn plain baseline: MLP + plain MSE, no causal weighting, no
loss aggregator (reference ``examples/allen_cahn/allen_cahn_plain.py``:
MSELoss everywhere, no mtl — runs off conf/allen_cahn.yaml upstream).

All logic lives in ``examples/allen_cahn.py``'s variant knobs; this entry
binds the plain configuration file.
"""

from allen_cahn import evaluate, export, inference, train


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/allen_cahn_plain.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate, export=export, inference=inference)

    return _main()


if __name__ == "__main__":
    main_cli()
