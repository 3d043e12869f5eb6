"""DeepHPMs on Korteweg-de Vries: hidden operator N(u, u_x, u_xx, u_xxx)
(reference ``examples/deephpms/korteweg_de_vries.py``; t in [0,40],
x in [-20,20], third-order features per conf/korteweg_de_vries.yaml).

All logic lives in ``examples/deephpms.py``'s parametric PDE family; this
entry binds the KdV configuration file.
"""

import paddlescience_tpu as psci
from deephpms import run


def main_cli():
    @psci.utils.config.main("conf/deephpms_kdv.yaml")
    def _main(cfg):
        def train(c):
            return run(
                c,
                epochs=(c.TRAIN.epochs_idn, c.TRAIN.epochs_pde, c.TRAIN.epochs_sol),
                iters_per_epoch=c.TRAIN.iters_per_epoch,
                lr=c.TRAIN.learning_rate,
                output_dir=(c.get("output_dir") or "./outputs_deephpms_kdv"),
                dataset_path=c.get_path("dataset_path"),
                dataset_sol_path=c.get_path("dataset_sol_path"),
                pde="kdv",
            )

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
