"""Heart inverse problem: estimate the Young's modulus E from observed
displacements (reference ``examples/heart/inverse.py``).

All logic lives in ``examples/heart.py``'s ``problem`` knob (E becomes a
learnable equation parameter); this entry binds the inverse configuration.
"""

import paddlescience_tpu as psci
from heart import build_solver, main_cli as _heart_cli  # noqa: F401
import heart as _heart


def main_cli():
    import numpy as np

    import _runner

    @psci.utils.config.main("conf/heart_inverse.yaml")
    def _main(cfg):
        def train(c):
            solver = _runner.build_from_cfg(c, build_solver)
            solver.train()
            metric, group = solver.eval()
            _runner._print_metrics("final", metric, group)
            e_hat = float(np.asarray(solver.state["eq_params"]["E"]))
            rel = abs(e_hat - c.e) / c.e
            print(f"inverse E estimate = {e_hat:.4f} kPa (true {c.e}), rel err {rel:.3f}")
            return rel

        return psci.utils.config.dispatch(cfg, train=train)

    return _main()


if __name__ == "__main__":
    main_cli()
