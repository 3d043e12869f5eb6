"""Shared mode-dispatch runner for the example suite.

Every case exposes ``main()`` decorated with ``psci.utils.config.main`` and
dispatches ``cfg.mode`` in {train, eval, export, infer} (the contract each
reference example repeats by hand under ``@hydra.main``, e.g.
``/root/reference/examples/allen_cahn/allen_cahn_default.py:273-288``).

``run(cfg, build)`` implements the four modes generically for Solver-based
cases; cases with bespoke loops pass their own callables to
``psci.utils.config.dispatch`` directly.
"""

from __future__ import annotations

import os

import numpy as np


def build_from_cfg(cfg, build_solver, **extra):
    """Map cfg fields onto a case's ``build_solver(...)`` kwargs by
    signature introspection: TRAIN.<name> first, then top-level <name>;
    ``output_dir`` comes from cfg.output_dir."""
    import inspect

    sig = inspect.signature(build_solver)
    kw = {}
    train_cfg = cfg.get("TRAIN", {}) or {}
    for name, p in sig.parameters.items():
        if name == "output_dir":
            kw[name] = cfg.get("output_dir") or p.default
        elif name in train_cfg:
            kw[name] = train_cfg[name]
        elif name in cfg:
            kw[name] = cfg[name]
    kw.update(extra)
    return build_solver(**kw)


def _unwrap(built):
    """build(cfg) may return solver or (solver, aux)."""
    if isinstance(built, tuple):
        return built[0], built[1:]
    return built, ()


def _print_metrics(prefix, metric, metric_group):
    flat = {
        f"{g}.{k}": float(np.asarray(v).mean())
        for g, kv in (metric_group or {}).items()
        for k, v in kv.items()
    }
    print(f"{prefix} metric = {metric:.4e}" + (f" | {flat}" if flat else ""))


def train(cfg, build):
    solver, _ = _unwrap(build(cfg))
    solver.train()
    if solver.validator:
        metric, group = solver.eval()
        _print_metrics("final", metric, group)
        return metric
    return None


def evaluate(cfg, build):
    solver, _ = _unwrap(build(cfg))
    path = cfg.get_path("EVAL.pretrained_model_path")
    if path:
        solver.load_pretrain(path)
    metric, group = solver.eval()
    _print_metrics("eval", metric, group)
    return metric


def export(cfg, build):
    solver, _ = _unwrap(build(cfg))
    path = cfg.get_path("INFER.pretrained_model_path")
    if path:
        solver.load_pretrain(path)
    export_path = cfg.get_path("INFER.export_path", "./inference/model")
    solver.export(export_path=export_path)
    print(f"exported to {export_path}")


def inference(cfg, build, infer_fn=None):
    import paddlescience_tpu as psci

    solver, aux = _unwrap(build(cfg))
    path = cfg.get_path("INFER.pretrained_model_path")
    if not path:
        export_path = cfg.get_path("INFER.export_path", "./inference/model")
        path = os.path.join(os.path.dirname(export_path) or ".", "checkpoints",
                            os.path.basename(export_path))
    predictor = psci.deploy.PINNPredictor(solver.model, checkpoint_path=path)
    if infer_fn is not None:
        return infer_fn(cfg, solver, predictor, *aux)
    # default: predict the first validator batch and report output stats
    if solver.validator:
        v = next(iter(solver.validator.values()))
        inp, lab, _ = next(iter(v.data_loader))
        out = predictor.predict(
            {k: np.asarray(x) for k, x in inp.items()},
            cfg.get_path("INFER.batch_size", 1024))
        stats = {k: float(np.abs(v).mean()) for k, v in out.items()}
        print(f"infer outputs (mean |.|): {stats}")
        return out
    raise NotImplementedError("no validator to draw inference inputs from; "
                              "pass infer_fn for this case")


def run(cfg, build, infer_fn=None):
    """Generic four-mode dispatch for Solver-based cases."""
    import paddlescience_tpu as psci

    return psci.utils.config.dispatch(
        cfg,
        train=lambda c: train(c, build),
        evaluate=lambda c: evaluate(c, build),
        export=lambda c: export(c, build),
        inference=lambda c: inference(c, build, infer_fn),
    )
