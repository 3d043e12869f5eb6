"""Allen-Cahn with PirateNet — the flagship accuracy recipe (reference
``examples/allen_cahn/allen_cahn_piratenet.py``: PirateNet 3 blocks x 256,
Fourier scale 2.0, RWF(1.0, 0.1), causal loss + GradNorm, 300 epochs;
reference pin L2Rel 1.2e-5, ``docs/zh/examples/allen_cahn.md:41-43``).

All logic lives in ``examples/allen_cahn.py``'s variant knobs; this entry
binds the piratenet configuration file.
"""

from allen_cahn import evaluate, export, inference, train


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/allen_cahn_piratenet.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate, export=export, inference=inference)

    return _main()


if __name__ == "__main__":
    main_cli()
