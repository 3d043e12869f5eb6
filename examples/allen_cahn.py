"""Allen-Cahn PINN — the flagship benchmark case (BASELINE.json north star).

TPU-native port of reference ``examples/allen_cahn/allen_cahn_default.py``:
  u_t - 1e-4 u_xx + 5 u^3 - 5 u = 0,  (t,x) in [0,1] x [-1,1]
  u(0,x) = x^2 cos(pi x),  periodic in x.

Differences from the reference (both TPU-first):
  * the PDE collocation batch is drawn ON DEVICE inside the jitted step
    (DeviceSampledDataset) with t sorted for the causal loss — zero
    host->device traffic per step (reference regenerates numpy batches,
    examples/allen_cahn/allen_cahn_default.py:85-99);
  * the reference validation data (allen_cahn.mat download) is replaced by a
    built-in Fourier pseudo-spectral ETDRK4 solver (same role as the
    reference's LBM/CUDA data generators — here a few numpy FFT lines).

Run: python examples/allen_cahn.py [epochs] [iters_per_epoch]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def solve_allen_cahn_spectral(nx: int = 512, nt: int = 201, t_max: float = 1.0, eps2: float = 1e-4):
    """Reference solution via Fourier pseudo-spectral ETDRK4
    (Kassam & Trefethen 2005 scheme), periodic on [-1, 1]."""
    L = 2.0
    x = np.linspace(-1, 1, nx, endpoint=False)
    u = (x**2) * np.cos(np.pi * x)
    k = 2 * np.pi * np.fft.fftfreq(nx, d=L / nx)  # wavenumbers

    lin = -eps2 * k**2 + 5.0  # linear operator in Fourier space (from +5u)
    dt = 1e-4
    steps_total = int(round(t_max / dt))
    save_every = max(steps_total // (nt - 1), 1)

    E = np.exp(dt * lin)
    E2 = np.exp(dt * lin / 2)
    M = 32  # quadrature points on unit circle for phi functions
    r = np.exp(1j * np.pi * (np.arange(1, M + 1) - 0.5) / M)
    LR = dt * lin[:, None] + r[None, :]
    Q = dt * np.real(np.mean((np.exp(LR / 2) - 1) / LR, axis=1))
    f1 = dt * np.real(np.mean((-4 - LR + np.exp(LR) * (4 - 3 * LR + LR**2)) / LR**3, axis=1))
    f2 = dt * np.real(np.mean((2 + LR + np.exp(LR) * (-2 + LR)) / LR**3, axis=1))
    f3 = dt * np.real(np.mean((-4 - 3 * LR - LR**2 + np.exp(LR) * (4 - LR)) / LR**3, axis=1))

    def N_of(v_hat):
        v = np.real(np.fft.ifft(v_hat))
        return np.fft.fft(-5.0 * v**3)

    v = np.fft.fft(u)
    out = [u.copy()]
    for step in range(1, steps_total + 1):
        Nv = N_of(v)
        a = E2 * v + Q * Nv
        Na = N_of(a)
        b = E2 * v + Q * Na
        Nb = N_of(b)
        c = E2 * a + Q * (2 * Nb - Nv)
        Nc = N_of(c)
        v = E * v + Nv * f1 + 2 * (Na + Nb) * f2 + Nc * f3
        if step % save_every == 0 and len(out) < nt:
            out.append(np.real(np.fft.ifft(v)))
    while len(out) < nt:
        out.append(out[-1])
    t = np.linspace(0, t_max, nt)
    return t.astype(np.float32), x.astype(np.float32), np.stack(out).astype(np.float32)


def get_reference_solution(cache_path: str = "./dataset/allen_cahn_ref.npz"):
    if os.path.exists(cache_path):
        d = np.load(cache_path)
        return d["t"], d["x"], d["usol"]
    t, x, usol = solve_allen_cahn_spectral()
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    np.savez(cache_path, t=t, x=x, usol=usol)
    return t, x, usol


def build_solver(
    epochs: int = 200,
    iters_per_epoch: int = 1000,
    batch_size: int = 4096,
    output_dir: str = "./output_allen_cahn",
    eval_during_train: bool = True,
    with_validator: bool = True,
    seed: int = 42,
    arch: str = "mlp",
    piratenet_blocks: int = 3,
    learning_rate: float = 1e-3,
    gamma: float = 0.9,
    decay_steps: int = 2000,
    checkpoint_path: str = None,
    fourier_scale: float = None,  # None = arch default (mlp 1.0, piratenet 2.0)
    rwf_mean: float = None,  # None = arch default (mlp 0.5, piratenet 1.0)
    rwf_std: float = 0.1,
    loss: str = "causal",
    aggregator: str = "gradnorm",
    eval_freq: int = 10,
):
    """Variant knobs cover the whole reference script family
    (``/root/reference/examples/allen_cahn/``):

    ============  ============  =============  ==========  ===========
    variant       arch          fourier_scale  loss        aggregator
    ============  ============  =============  ==========  ===========
    default       mlp           1.0            causal      gradnorm
    causal        mlp           1.0            causal      sum
    plain         mlp           1.0            mse         sum
    default_ntk   mlp           2.0            causal      ntk
    sota          modified_mlp  2.0            causal      ntk
    piratenet     piratenet     2.0            causal      gradnorm
    ============  ============  =============  ==========  ===========

    (The reference's ntk/sota scripts pass ``AllenCahn(0.01**2)`` — with its
    eps**2 residual that sets the interfacial coefficient to 1e-8 instead of
    the problem's 1e-4; we keep eps=0.01 for all variants.)
    """
    import jax
    import jax.numpy as jnp

    import paddlescience_tpu as psci
    from paddlescience_tpu.constraint.base import Constraint
    from paddlescience_tpu.data import DeviceSampledDataset
    from paddlescience_tpu.loss import mtl

    psci.utils.set_random_seed(seed)

    if fourier_scale is None:
        fourier_scale = 2.0 if arch in ("piratenet", "modified_mlp") else 1.0
    if rwf_mean is None:
        rwf_mean = 1.0 if arch in ("piratenet", "modified_mlp") else 0.5
    fourier = {"dim": 256, "scale": fourier_scale} if fourier_scale > 0 else None
    rwf = {"mean": rwf_mean, "std": rwf_std} if rwf_mean > 0 else None
    # model per reference conf/allen_cahn_default.yaml MODEL section;
    # arch="piratenet" follows conf/allen_cahn_piratenet.yaml (3 blocks x 256)
    if arch == "piratenet":
        model = psci.arch.PirateNet(
            ("t", "x"),
            ("u",),
            num_blocks=piratenet_blocks,
            hidden_size=256,
            activation="tanh",
            periods={"x": (2.0, False)},
            fourier=fourier,
            random_weight=rwf,
        )
    else:
        cls = psci.arch.ModifiedMLP if arch == "modified_mlp" else psci.arch.MLP
        model = cls(
            ("t", "x"),
            ("u",),
            num_layers=4,
            hidden_size=256,
            activation="tanh",
            periods={"x": (2.0, False)},
            fourier=fourier,
            random_weight=rwf,
        )

    equation = {"AllenCahn": psci.equation.AllenCahn(eps=0.01)}

    t_star, x_star, u_ref = get_reference_solution()
    t0, t1 = float(t_star[0]), float(t_star[-1])
    x0, x1 = float(x_star[0]), float(x_star[-1])
    u0 = u_ref[0, :]

    # PDE constraint: device-side resampled collocation batch, t sorted
    # (causal chunking needs time-ordered batches; reference sorts on host)
    def sample_fn(key):
        kt, kx = jax.random.split(key)
        t = jnp.sort(jax.random.uniform(kt, (batch_size, 1), minval=t0, maxval=t1), axis=0)
        x = jax.random.uniform(kx, (batch_size, 1), minval=x0, maxval=x1)
        return {"t": t, "x": x}, {"allen_cahn": jnp.zeros((batch_size, 1))}, {}

    pde_loss = (
        psci.loss.CausalMSELoss(32, "mean", tol=1.0)
        if loss == "causal"
        else psci.loss.MSELoss("mean")
    )
    pde = Constraint(DeviceSampledDataset(sample_fn), None, pde_loss, "PDE")
    pde.output_expr = equation["AllenCahn"].equations

    ic = psci.constraint.SupervisedConstraint(
        {
            "dataset": {
                "name": "IterableNamedArrayDataset",
                "input": {"t": np.full((len(x_star), 1), t0, np.float32), "x": x_star.reshape(-1, 1)},
                "label": {"u": u0.reshape(-1, 1)},
            },
        },
        psci.loss.MSELoss("mean"),
        {"u": lambda out: out["u"]},
        name="IC",
    )
    constraint = {"PDE": pde, "IC": ic}

    lr = psci.optimizer.lr_scheduler.ExponentialDecay(
        epochs=epochs, iters_per_epoch=iters_per_epoch, learning_rate=learning_rate,
        gamma=gamma, decay_steps=decay_steps,
    )()
    optimizer = psci.optimizer.Adam(lr)(model)

    validator = None
    if with_validator:
        tx = psci.utils.misc.cartesian_product(t_star, x_star).astype(np.float32)
        validator = {
            "u_validator": psci.validate.SupervisedValidator(
                {
                    "dataset": {
                        "name": "NamedArrayDataset",
                        "input": {"t": tx[:, 0:1], "x": tx[:, 1:2]},
                        "label": {"u": u_ref.reshape(-1, 1)},
                    },
                    "batch_size": 16384,
                },
                psci.loss.MSELoss("mean"),
                {"u": lambda out: out["u"]},
                metric={"L2Rel": psci.metric.L2Rel()},
                name="u_validator",
            )
        }

    solver = psci.solver.Solver(
        model,
        constraint,
        output_dir,
        optimizer,
        epochs=epochs,
        iters_per_epoch=iters_per_epoch,
        eval_during_train=eval_during_train,
        eval_freq=eval_freq,
        validator=validator,
        equation=equation,
        loss_aggregator={
            "gradnorm": lambda: mtl.GradNorm(model, len(constraint), 1000, 0.9),
            "ntk": lambda: mtl.NTK(model, len(constraint), 1000),
            "sum": lambda: mtl.Sum(model, len(constraint)),
        }[aggregator](),
        log_freq=100,
        seed=seed,
        checkpoint_path=checkpoint_path,
    )
    return solver, (t_star, x_star, u_ref)


def _solver_from_cfg(cfg, **overrides):
    import paddlescience_tpu as psci  # noqa: F401

    kw = dict(
        epochs=cfg.TRAIN.epochs,
        iters_per_epoch=cfg.TRAIN.iters_per_epoch,
        batch_size=cfg.TRAIN.batch_size,
        output_dir=cfg.output_dir or "./output_allen_cahn",
        eval_during_train=cfg.TRAIN.eval_during_train,
        seed=cfg.seed,
        arch=cfg.MODEL.arch,
        piratenet_blocks=cfg.MODEL.get("piratenet_blocks", 3),
        learning_rate=cfg.TRAIN.get("learning_rate", 1e-3),
        gamma=cfg.TRAIN.get("gamma", 0.9),
        decay_steps=cfg.TRAIN.get("decay_steps", 2000),
        checkpoint_path=cfg.TRAIN.get("checkpoint_path", None),
        fourier_scale=cfg.MODEL.get("fourier_scale", None),
        rwf_mean=cfg.MODEL.get("rwf_mean", None),
        rwf_std=cfg.MODEL.get("rwf_std", 0.1),
        loss=cfg.TRAIN.get("loss", "causal"),
        aggregator=cfg.TRAIN.get("aggregator", "gradnorm"),
        eval_freq=cfg.TRAIN.get("eval_freq", 10),
    )
    kw.update(overrides)
    return build_solver(**kw)


def train(cfg):
    # TRAIN.matmul_precision: "default" (bf16 passes, fastest), "high"
    # (3-pass bf16) or "highest" (full f32). The reference trains pure f32 on
    # GPU; on TPU the bf16 default floors final L2Rel around 1e-4 and "high"
    # floors it around 8e-5 (r5 root-cause: seed 42 scored 7.69e-5 @ high vs
    # 4.81e-5 @ highest), so the accuracy-pin recipe runs with "highest".
    prec = cfg.TRAIN.get("matmul_precision")
    if prec:
        import jax

        jax.config.update("jax_default_matmul_precision", str(prec))
    solver, _ = _solver_from_cfg(cfg)
    solver.train()
    metric, _ = solver.eval()
    print(f"final L2Rel.u = {metric:.4e}")
    # the reference pins the BEST model's metric (best_model checkpoint,
    # eval_during_train) — report it alongside the last-epoch metric
    best = solver.best_metric.get("metric", float("inf"))
    if best < float("inf"):
        print(f"best  L2Rel.u = {best:.4e} @ epoch {solver.best_metric['epoch']}")
        metric = min(metric, best)
    return metric


def evaluate(cfg):
    solver, _ = _solver_from_cfg(cfg, eval_during_train=False)
    if cfg.EVAL.pretrained_model_path:
        solver.load_pretrain(cfg.EVAL.pretrained_model_path)
    metric, metrics = solver.eval()
    print(f"eval L2Rel.u = {metric:.4e}")
    return metric


def export(cfg):
    solver, _ = _solver_from_cfg(cfg, eval_during_train=False, with_validator=False)
    if cfg.INFER.pretrained_model_path:
        solver.load_pretrain(cfg.INFER.pretrained_model_path)
    solver.export(export_path=cfg.INFER.export_path)
    print(f"exported to {cfg.INFER.export_path}")


def inference(cfg):
    import paddlescience_tpu as psci

    solver, (t_star, x_star, u_ref) = _solver_from_cfg(
        cfg, eval_during_train=False, with_validator=False)
    predictor = psci.deploy.PINNPredictor(
        solver.model,
        checkpoint_path=cfg.INFER.pretrained_model_path
        or os.path.join(os.path.dirname(cfg.INFER.export_path) or ".",
                        "checkpoints", os.path.basename(cfg.INFER.export_path)),
    )
    tx = psci.utils.misc.cartesian_product(t_star, x_star).astype(np.float32)
    out = predictor.predict({"t": tx[:, 0:1], "x": tx[:, 1:2]}, cfg.INFER.batch_size)
    u_pred = out["u"].reshape(len(t_star), len(x_star))
    l2 = float(np.linalg.norm(u_pred - u_ref) / np.linalg.norm(u_ref))
    print(f"infer L2Rel.u = {l2:.4e}")
    return l2


def main_cli():
    import paddlescience_tpu as psci

    @psci.utils.config.main("conf/allen_cahn.yaml")
    def _main(cfg):
        return psci.utils.config.dispatch(
            cfg, train=train, evaluate=evaluate, export=export, inference=inference)

    return _main()


if __name__ == "__main__":
    main_cli()
