"""CViT on 1D linear advection (reference ``examples/adv/adv_cvit.py``).

CVit1D learns the solution operator u0 -> u(T) of periodic linear advection.
Training uses the reference's random-function-batch generator
(ContinuousNamedArrayDataset with on-the-fly query-grid subsampling). The
reference's adv_a0/adv_aT .npy arrays are used when present under
``data_dir``; otherwise initial conditions are sampled as random Fourier
series and the labels are the EXACT advected solutions (a periodic shift) —
same operator, synthetic functions.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

import paddlescience_tpu as psci

N_GRID = 200
SHIFT = 0.5  # c*T in periodic units


def synth_adv(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, N_GRID, endpoint=False)
    k = np.arange(1, 9)
    a = rng.standard_normal((n, k.size)) / k
    b = rng.standard_normal((n, k.size)) / k
    u0 = (a @ np.sin(2 * np.pi * np.outer(k, x)) + b @ np.cos(2 * np.pi * np.outer(k, x)))
    u0 = u0 / np.abs(u0).max(axis=1, keepdims=True)
    shift = int(SHIFT * N_GRID)
    uT = np.roll(u0, shift, axis=1)  # exact periodic advection
    return u0.astype("float32"), uT.astype("float32")


def load_data(data_dir, n=4096, seed=0):
    a0p = osp.join(data_dir or ".", "adv_a0.npy")
    aTp = osp.join(data_dir or ".", "adv_aT.npy")
    if data_dir and osp.exists(a0p) and osp.exists(aTp):
        u0 = np.load(a0p).astype("float32").T  # (B, N)
        uT = np.load(aTp).astype("float32").T
        return u0, uT
    print(f"[adv_cvit] {data_dir!r} data absent -> synthetic Fourier advection set")
    return synth_adv(n, seed)


def build_solver(epochs=100, iters_per_epoch=20, output_dir="./outputs_adv_cvit",
                 batch_size=64, grid_size=128, learning_rate=1e-3, n_data=4096,
                 data_dir="./dataset/adv", emb_dim=128, depth=4, num_heads=4):
    psci.utils.set_random_seed(42)
    u0, uT = load_data(data_dir, n_data)
    grid = np.linspace(0, 1, N_GRID, dtype="float32")
    n_train = int(0.8 * len(u0))
    tr_u, tr_s = u0[:n_train, :, None], uT[:n_train]
    te_u, te_s = u0[n_train:, :, None], uT[n_train:]
    rng = np.random.default_rng(0)

    def gen_input_batch():
        batch_idx = rng.integers(0, tr_u.shape[0], batch_size)
        grid_idx = np.sort(rng.integers(0, N_GRID, grid_size))
        return {"u": tr_u[batch_idx],
                "y": grid[grid_idx][None, :, None].repeat(batch_size, 0),
                "batch_idx": batch_idx, "grid_idx": grid_idx}

    def gen_label_batch(input_batch):
        batch_idx = input_batch.pop("batch_idx")
        grid_idx = input_batch.pop("grid_idx")
        return {"s": tr_s[batch_idx][:, grid_idx, None]}

    sup = psci.constraint.SupervisedConstraint(
        {"dataset": {"name": "ContinuousNamedArrayDataset",
                     "input": gen_input_batch, "label": gen_label_batch},
         "iters_per_epoch": iters_per_epoch},
        psci.loss.MSELoss("mean"),
        {"s": lambda out: out["s"]},
        name="Sup",
    )
    model = psci.arch.CVit1D(
        input_keys=("u", "y"), output_keys=("s",),
        spatial_dims=N_GRID, in_dim=1, coords_dim=1, patch_size=(4,),
        grid_size=(N_GRID,), latent_dim=128, emb_dim=emb_dim, depth=depth,
        num_heads=num_heads, dec_emb_dim=emb_dim, dec_num_heads=num_heads,
        dec_depth=1, num_mlp_layers=1, mlp_ratio=2, out_dim=1,
    )
    n_test = len(te_u)
    validator = {
        "adv_valid": psci.validate.SupervisedValidator(
            {"dataset": {"name": "NamedArrayDataset",
                         "input": {"u": te_u, "y": np.broadcast_to(
                             grid[None, :, None], (n_test, N_GRID, 1)).copy()},
                         "label": {"s": te_s[..., None]}},
             "total_size": n_test, "batch_size": min(256, n_test),
             "sampler": {"name": "BatchSampler", "shuffle": False, "drop_last": False}},
            psci.loss.MSELoss("mean"),
            metric={"L2Rel": psci.metric.L2Rel()},
            name="adv_valid",
        )
    }
    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs, iters_per_epoch, learning_rate, gamma=0.9,
        decay_steps=max(epochs // 10, 1) * iters_per_epoch)()
    return psci.solver.Solver(
        model, {"Sup": sup}, output_dir,
        psci.optimizer.AdamW(lr, weight_decay=1e-5)(model),
        epochs=epochs, iters_per_epoch=iters_per_epoch,
        eval_during_train=False, validator=validator,
    )


def main_cli():
    import _runner

    @psci.utils.config.main("conf/adv_cvit.yaml")
    def _main(cfg):
        return _runner.run(cfg, lambda c: _runner.build_from_cfg(c, build_solver))

    return _main()


if __name__ == "__main__":
    main_cli()
