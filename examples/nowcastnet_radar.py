"""NowcastNet precipitation nowcasting (reference
``examples/nowcastnet/nowcastnet.py`` — inference over MRMS radar cases).

Evolution network (advection by predicted motion + intensity residual)
followed by generative refinement. Trains briefly on synthetic advecting
rain cells from RadarDataset, then writes a VisualizerRadar frame strip —
the reference runs pretrained inference only.
"""

import os
import sys

import numpy as np

import paddlescience_tpu as psci

H = W = 32
IN_LEN, TOTAL = 4, 10


def build_solver(epochs=3, output_dir="./output_nowcastnet"):
    psci.utils.set_random_seed(0)
    model = psci.arch.NowcastNet(
        ("input",), ("output",),
        input_length=IN_LEN, total_length=TOTAL,
        image_height=H, image_width=W, ngf=16)
    dl = {
        "dataset": {"name": "RadarDataset", "input_keys": ("input",), "label_keys": ("output",),
                    "image_width": W, "image_height": H,
                    "total_length": TOTAL, "input_length": IN_LEN},
        "batch_size": 4,
        "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": True},
    }
    sup = psci.constraint.SupervisedConstraint(
        dl, psci.loss.MSELoss("mean"), {"output": lambda out: out["output"]}, name="Sup")
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.Adam(1e-3)(model),
        epochs=epochs, iters_per_epoch=4, log_freq=4)
def _report(solver):
    import os as _os
    ds = psci.data.build_dataset({"name": "RadarDataset", "input_keys": ("input",),
        "label_keys": ("output",), "image_width": W, "image_height": H,
        "total_length": TOTAL, "input_length": IN_LEN})
    x = ds.input["input"][:1]
    pred = solver.predict({"input": x}, return_numpy=True)["output"]
    vis = psci.visualize.VisualizerRadar({"input": x}, {"pred": lambda d: d["pred"]})
    vis.save(_os.path.join(solver.output_dir or ".", "nowcast"), {"pred": pred[0, :, :, :, 0]})
    print(f"nowcastnet: predicted {pred.shape[1]} frames, strip saved")
    return float(np.abs(pred).mean())

def main_cli():
    import paddlescience_tpu as psci

    import _runner

    def _build(cfg):
        return _runner.build_from_cfg(cfg, build_solver)

    def _train(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        solver.train()
        return _report(solver)

    def _evaluate(cfg):
        solver, _ = _runner._unwrap(_build(cfg))
        path = cfg.get_path("EVAL.pretrained_model_path")
        if path:
            solver.load_pretrain(path)
        return _report(solver)

    @psci.utils.config.main("conf/nowcastnet_radar.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=_train, evaluate=_evaluate,
            export=lambda c: _runner.export(c, _build),
            inference=lambda c: _runner.inference(c, _build))

    return _main()


if __name__ == "__main__":
    main_cli()
