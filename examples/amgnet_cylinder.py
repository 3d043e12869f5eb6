"""AMGNet flow-field prediction on cylinder meshes (reference
``examples/amgnet/amgnet_cylinder.py``).

All logic lives in ``examples/amgnet_airfoil.py``'s ``case`` knob; this
entry binds the cylinder configuration file (MeshCylinderDataset, 4-dim
node features).
"""

import paddlescience_tpu as psci
from amgnet_airfoil import main


def main_cli():
    @psci.utils.config.main("conf/amgnet_cylinder.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.steps, case="cylinder"))

    return _main()


if __name__ == "__main__":
    main_cli()
