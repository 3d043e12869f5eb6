"""PhyGeoNet with parameterized boundary conditions (reference
``examples/phygeonet/heat_equation_with_bc.py``).

All logic lives in ``examples/phygeonet.py``'s ``build_solver_bc``; this
entry binds the parametric-BC configuration file.
"""

import paddlescience_tpu as psci
from phygeonet import build_solver_bc, evaluate_field_bc


def main_cli():
    import _runner

    @psci.utils.config.main("conf/phygeonet_bc.yaml")
    def _main(cfg):
        def train(c):
            solver, aux = _runner.build_from_cfg(c, build_solver_bc)
            solver.train()
            return evaluate_field_bc(solver, aux)

        def evaluate(c):
            solver, aux = _runner.build_from_cfg(c, build_solver_bc)
            path = c.get_path("EVAL.pretrained_model_path")
            if path:
                solver.load_pretrain(path)
            return evaluate_field_bc(solver, aux)

        return psci.utils.config.dispatch(cfg, train=train, evaluate=evaluate)

    return _main()


if __name__ == "__main__":
    main_cli()
