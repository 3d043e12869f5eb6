"""DeepPhyLSTM-3: adds the hysteresis-rate LSTM and consistency loss
(reference ``examples/phylstm/phylstm3.py``).

All logic lives in ``examples/phylstm_seismic.py``'s ``model_type`` knob;
this entry binds the type-3 configuration file.
"""

import paddlescience_tpu as psci
from phylstm_seismic import main


def main_cli():
    @psci.utils.config.main("conf/phylstm3_seismic.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps, model_type=3))

    return _main()


if __name__ == "__main__":
    main_cli()
