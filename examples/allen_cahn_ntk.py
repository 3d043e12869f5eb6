"""Allen-Cahn NTK-weighted recipe: MLP + causal loss + NTK trace weighting
(reference ``examples/allen_cahn/allen_cahn_defalut_ntk.py`` [sic]:
mtl.NTK over the PDE/IC split, fourier scale 2.0, RWF(1.0, 0.1)).

All logic lives in ``examples/allen_cahn.py``'s variant knobs; this entry
binds the NTK configuration file.
"""

from allen_cahn import evaluate, export, inference, train


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/allen_cahn_ntk.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate, export=export, inference=inference)

    return _main()


if __name__ == "__main__":
    main_cli()
