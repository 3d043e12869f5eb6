"""Steady LDC, ldc_2d_Re3200_piratenet recipe (reference examples/ldc/ldc_2d_Re3200_piratenet.py).
Curriculum over Re with per-key GradNorm balancing; ground truth from
tools/gen_ldc_reference.py (see examples/_ldc_common.py)."""

import paddlescience_tpu as psci

import _ldc_common


def main_cli():
    @psci.utils.config.main("conf/ldc_2d_Re3200_piratenet.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg,
            train=_ldc_common.train_curriculum,
            evaluate=_ldc_common.evaluate,
        )

    return _main()


if __name__ == "__main__":
    main_cli()
