"""Darcy flow operator learning with UNO (reference
``examples/neuraloperator/train_uno.py``).

All logic lives in ``examples/darcy_tfno.py``'s ``arch`` knob; this entry
binds the UNO configuration file.
"""

import paddlescience_tpu as psci
from darcy_tfno import build_solver


def main_cli():
    import _runner

    @psci.utils.config.main("conf/darcy_uno.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
