"""Export + deploy inference round trip (reference
``deploy/python_infer/pinn_predictor.py`` + examples' ``mode=export/infer``).

Trains a small PINN, saves a checkpoint, exports a jitted inference
callable, then reloads through deploy.PINNPredictor (fp32 and bf16) and
checks the three paths agree.
"""

import os
import sys

import numpy as np

import paddlescience_tpu as psci


def main(epochs=3):
    psci.utils.set_random_seed(0)
    # quick laplace2d-style train
    model = psci.arch.MLP(("x", "y"), ("u",), 3, 32)
    geom = psci.geometry.Rectangle((0, 0), (1, 1))
    equation = {"laplace": psci.equation.Laplace(2)}
    cfg = {"dataset": "IterableNamedArrayDataset", "iters_per_epoch": 5}
    interior = psci.constraint.InteriorConstraint(
        equation["laplace"].equations, {"laplace": 0}, geom,
        {**cfg, "batch_size": 256}, psci.loss.MSELoss("mean"), name="EQ")
    solver = psci.solver.Solver(
        model, {"EQ": interior}, "./output_export_demo",
        psci.optimizer.Adam(1e-3)(model), epochs=epochs, iters_per_epoch=5,
        equation=equation, log_freq=100)
    solver.train()
    from paddlescience_tpu.utils import save_load
    save_load.save_checkpoint(solver.state, solver.output_dir, "export_demo")
    ckpt = os.path.join(solver.output_dir, "checkpoints", "export_demo")

    inp = {"x": np.random.rand(64, 1).astype(np.float32),
           "y": np.random.rand(64, 1).astype(np.float32)}

    # path 1: solver.predict
    ref = solver.predict(inp, return_numpy=True)["u"]
    # path 2: exported jitted callable
    fn = solver.export()
    out2 = np.asarray(fn(inp)["u"])
    # path 3: deploy predictor from checkpoint
    pred = psci.deploy.PINNPredictor(model, checkpoint_path=ckpt)
    out3 = np.asarray(pred.predict(inp)["u"])
    # bf16 predictor path
    pred16 = psci.deploy.PINNPredictor(model, checkpoint_path=ckpt, precision="bf16")
    out4 = np.asarray(pred16.predict(inp)["u"])

    e2 = np.abs(ref - out2).max()
    e3 = np.abs(ref - out3).max()
    e4 = np.abs(ref - out4).max()
    print(f"export/infer agreement: export {e2:.2e}, predictor {e3:.2e}, bf16 {e4:.2e}")
    assert e2 < 1e-6 and e3 < 1e-6 and e4 < 0.05

    # path 5: portable TF SavedModel lane (reference paddle2onnx analog,
    # solver.py:939-958) — export, reload with TensorFlow, compare
    e5 = None
    try:
        import tensorflow as tf
    except Exception:
        print("tensorflow unavailable; skipping SavedModel lane")
    else:
        sm_path = os.path.join(solver.output_dir, "export_demo_sm")
        solver.export(input_spec={k: v[:1] for k, v in inp.items()},
                      export_path=sm_path, format="savedmodel")
        loaded = tf.saved_model.load(sm_path + ".savedmodel")
        out5 = loaded.f(tf.constant(inp["x"]), tf.constant(inp["y"]))["u"].numpy()
        e5 = np.abs(ref - out5).max()
        print(f"savedmodel agreement: {e5:.2e}")
        assert e5 < 1e-5
    return e2, e3, e4
def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/export_and_infer.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=lambda c: main(c.TRAIN.epochs))

    return _main()


if __name__ == "__main__":
    main_cli()
