"""Heart inverse problem: estimate the Young's modulus E from observed
displacements (reference ``examples/heart/inverse.py``).

All logic lives in ``examples/heart.py``'s ``problem`` knob (E becomes a
learnable equation parameter); this entry binds the inverse configuration.
"""

import paddlescience_tpu as psci
from heart import train_and_report


def main_cli():
    @psci.utils.config.main("conf/heart_inverse.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(cfg, train=train_and_report)

    return _main()


if __name__ == "__main__":
    main_cli()
