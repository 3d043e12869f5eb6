"""FourCastNet finetune stage: two-step autoregressive rollout supervision
(reference ``examples/fourcastnet/train_finetune.py``: the pretrained AFNONet
is rolled out ``num_timestamps`` steps, each step supervised against the
t+i frame, warm-started from the pretrain checkpoint).

All logic lives in ``examples/fourcastnet.py``'s ``num_timestamps`` /
``pretrained_model_path`` knobs; this entry binds the finetune config.
"""

import paddlescience_tpu as psci
from fourcastnet import build_solver


def main_cli():
    import _runner

    @psci.utils.config.main("conf/fourcastnet_finetune.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
