"""Allen-Cahn SOTA recipe: ModifiedMLP + causal loss + NTK weighting
(reference ``examples/allen_cahn/allen_cahn_sota.py``: ModifiedMLP(**MODEL),
CausalMSELoss, mtl.NTK, 300 epochs — conf/allen_cahn_sota.yaml).

All logic lives in ``examples/allen_cahn.py``'s variant knobs; this entry
binds the sota configuration file.
"""

from allen_cahn import evaluate, export, inference, train


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/allen_cahn_sota.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate, export=export, inference=inference)

    return _main()


if __name__ == "__main__":
    main_cli()
