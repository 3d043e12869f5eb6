"""DeepHPMs on Kuramoto-Sivashinsky: hidden operator
N(u, u_x, u_xx, u_xxx, u_xxxx) (reference
``examples/deephpms/kuramoto_sivashinsky.py``; t in [0,50], x in [-10,10],
fourth-order features per conf/kuramoto_sivashinsky.yaml).

All logic lives in ``examples/deephpms.py``'s parametric PDE family; this
entry binds the KS configuration file.
"""

import paddlescience_tpu as psci
from deephpms import run


def main_cli():
    @psci.utils.config.main("conf/deephpms_ks.yaml")
    def _main(cfg):
        def train(c):
            return run(
                c,
                epochs=(c.TRAIN.epochs_idn, c.TRAIN.epochs_pde, c.TRAIN.epochs_sol),
                iters_per_epoch=c.TRAIN.iters_per_epoch,
                lr=c.TRAIN.learning_rate,
                output_dir=(c.get("output_dir") or "./outputs_deephpms_ks"),
                dataset_path=c.get_path("dataset_path"),
                dataset_sol_path=c.get_path("dataset_sol_path"),
                pde="ks",
            )

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
