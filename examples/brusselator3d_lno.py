"""Laplace Neural Operator for the (2+1)-D Brusselator reaction-diffusion
system (reference ``examples/brusselator3d/brusselator3d.py``).

Reference protocol end-to-end: the npz dataset (inputs = 1-D forcing
signals, outputs = u(t, x, y) responses) is subsampled r=2 / cropped to
s=(ORIG_R-1)/r+1, the input signal is tiled over space, t/x/y grids are
concatenated as channels (DataFuncs.cat_grid, reference :67-90), fields are
min-max encoded, and a 3-D LNO (width 8, modes (4,4,4), hidden 64, relu,
instance norm) trains 300 epochs with AdamW(5e-3, wd 1e-4) under a
Step(100, 0.5) schedule on sum-reduced L2Rel loss — metric is L2Rel on the
held-out split (reference pin 0.07354, docs/zh/examples/brusselator3d.md).

The dataset itself is generated in-repo (``tools/gen_brusselator3d.py``,
Turing-unstable Brusselator driven by random smooth forcings) since the
upstream archive is not downloadable.
"""

from __future__ import annotations

import os

import numpy as np

import paddlescience_tpu as psci

NUM_T, NUM_XY = 39, 28
ORIG_R, RESOLUTION = 28, 2
_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "dataset", "brusselator3d_dataset.npz")


class DataFuncs:
    """Reference DataFuncs (brusselator3d.py:28-100): subsample, crop, tile
    the 1-D input over space, concatenate t/x/y grid channels, min-max
    encode."""

    def __init__(self, orig_r=ORIG_R, r=RESOLUTION, nt=NUM_T, nx=NUM_XY, ny=NUM_XY):
        self.orig_r, self.r, self.nt = orig_r, r, nt
        self.s = int((orig_r - 1) / r + 1)
        x = np.linspace(0, 1, orig_r)
        t = np.linspace(0, 1, nt)
        self.tt, self.xx, self.yy = np.meshgrid(t, x, x, indexing="ij")

    def gen_grid(self, grid, num):
        g = np.tile(grid, (num, 1, 1, 1))[:, :, :: self.r, :: self.r][:, :, : self.s, : self.s]
        return g.reshape(num, self.nt, self.s, self.s, 1)

    def cat_grid(self, data):
        n = data.shape[0]
        return np.concatenate(
            [data, self.gen_grid(self.tt, n), self.gen_grid(self.xx, n), self.gen_grid(self.yy, n)],
            axis=-1).astype(data.dtype)

    def transform(self, data, key="input"):
        if key == "input":  # (N, nt) signal -> tiled (N, nt, R, R)
            data = np.transpose(np.tile(data[None], (self.orig_r, self.orig_r, 1, 1)), (2, 3, 0, 1))
        data = data[:, :, :: self.r, :: self.r][:, :, : self.s, : self.s]
        return data.reshape(data.shape[0], self.nt, self.s, self.s, 1)

    @staticmethod
    def get_mean_std(data):
        lo, hi = np.min(data), np.max(data)
        return (lo + hi) / 2, (hi - lo) / 2

    @staticmethod
    def encode(data, mean, std):
        return (data - mean) / std


def build_solver(epochs=300, iters_per_epoch=16, batch_size=50,
                 output_dir="./output_brusselator3d", n_train=None):
    if not os.path.exists(_DATA):
        raise FileNotFoundError(
            f"'{_DATA}' not found — generate it with `python tools/gen_brusselator3d.py`")
    psci.utils.set_random_seed(42)
    raw = np.load(_DATA)
    funcs = DataFuncs()
    in_tr = funcs.transform(raw["inputs_train"], "input")
    lab_tr = funcs.transform(raw["outputs_train"], "label")
    in_te = funcs.transform(raw["inputs_test"], "input")
    lab_te = funcs.transform(raw["outputs_test"], "label")
    if n_train:
        in_tr, lab_tr = in_tr[:n_train], lab_tr[:n_train]
    in_mean, in_std = funcs.get_mean_std(in_tr)
    lab_mean, lab_std = funcs.get_mean_std(lab_tr)
    in_tr_enc = funcs.cat_grid(funcs.encode(in_tr, in_mean, in_std))
    in_te_enc = funcs.cat_grid(funcs.encode(in_te, in_mean, in_std))
    lab_tr_enc = funcs.encode(lab_tr, lab_mean, lab_std)

    T = np.linspace(0, 19, NUM_T, dtype=np.float32).reshape(1, NUM_T)
    X = np.linspace(0, 1, ORIG_R, dtype=np.float32).reshape(1, ORIG_R)[:, : funcs.s]
    model = psci.arch.LNO(("input",), ("output",), width=8, modes=(4, 4, 4), T=T,
                          data=(X, X), in_features=4, hidden_features=64,
                          activation="relu", use_norm=True)

    lr = psci.optimizer.lr_scheduler.Step(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=5e-3,
        step_size=100, gamma=0.5, by_epoch=True)()
    optimizer = psci.optimizer.AdamW(lr, weight_decay=1e-4)(model)

    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "NamedArrayDataset",
                     "input": {"input": in_tr_enc}, "label": {"output": lab_tr_enc}},
         "batch_size": batch_size,
         "sampler": {"name": "BatchSampler", "shuffle": True, "drop_last": False}},
        psci.loss.L2RelLoss("sum"), name="sup")

    # validator decodes predictions back to physical units (reference
    # decode-functional metric path)
    def decoded_l2rel(out_dict, label_dict):
        pred = np.asarray(out_dict["output"]) * lab_std + lab_mean
        ref = np.asarray(label_dict["output"])
        num = np.linalg.norm((pred - ref).reshape(pred.shape[0], -1), axis=1)
        den = np.linalg.norm(ref.reshape(ref.shape[0], -1), axis=1)
        return {"L2Rel": float(np.mean(num / den))}

    validator = {
        "sup_valid": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"input": in_te_enc}, "label": {"output": lab_te}},
             "batch_size": batch_size},
            psci.loss.L2RelLoss("sum"),
            {"output": lambda out: out["output"]},
            metric={"decoded": psci.metric.FunctionalMetric(decoded_l2rel)},
            name="sup_valid")
    }

    return psci.solver.Solver(
        model, {"sup": sup}, output_dir, optimizer,
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        validator=validator, eval_during_train=False, log_freq=100)


def main_cli():
    import _runner

    @psci.utils.config.main("conf/brusselator3d_lno.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
