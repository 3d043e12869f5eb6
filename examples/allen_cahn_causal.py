"""Allen-Cahn causal-weighting ablation: MLP + CausalMSE, unweighted sum
(reference ``examples/allen_cahn/allen_cahn_causal.py``: CausalMSELoss with
no mtl aggregator — conf/allen_cahn_causal_fourier_rwf.yaml).

All logic lives in ``examples/allen_cahn.py``'s variant knobs; this entry
binds the causal-ablation configuration file.
"""

from allen_cahn import evaluate, export, inference, train


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/allen_cahn_causal.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate, export=export, inference=inference)

    return _main()


if __name__ == "__main__":
    main_cli()
