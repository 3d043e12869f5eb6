"""Train–eval–infer benchmark harness.

TPU-native counterpart of the reference's ``test_tipc/`` shell harness
(benchmark_train.sh / test_train_inference_python.sh): runs a short train +
eval + predict cycle per example config, measuring samples/sec (ips) and
final metric, and writes one JSON line per case.

Usage: python tools/benchmark_suite.py [--cases laplace2d,euler_beam,...]
       [--out benchmark_results.jsonl] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from anywhere: the repo root provides `examples` and the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CASES = {
    "laplace2d": dict(module="examples.laplace2d", kwargs=dict(epochs=5, iters_per_epoch=5), batch_hint=10201),
    "euler_beam": dict(module="examples.euler_beam", kwargs=dict(epochs=10, iters_per_epoch=10), batch_hint=104),
    "allen_cahn": dict(module="examples.allen_cahn", kwargs=dict(epochs=1, iters_per_epoch=200, eval_during_train=False), batch_hint=4096),
    "deeponet": dict(module="examples.deeponet", kwargs=dict(epochs=3, iters_per_epoch=32), batch_hint=312),
    "ldc2d_steady": dict(module="examples.ldc2d_steady", kwargs=dict(epochs=3, iters_per_epoch=20), batch_hint=3072),
    "darcy_tfno": dict(module="examples.darcy_tfno", kwargs=dict(epochs=2, n_train=32, n_eval=8, resolution=24), batch_hint=16),
    "viv": dict(module="examples.viv", kwargs=dict(epochs=5, iters_per_epoch=20), batch_hint=200),
}


def run_case(name: str, spec: dict) -> dict:
    import importlib

    mod = importlib.import_module(spec["module"])
    t0 = time.perf_counter()
    out = mod.build_solver(**spec["kwargs"])
    solver = out[0] if isinstance(out, tuple) else out
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    solver.train()
    train_s = time.perf_counter() - t0
    steps = solver.epochs * solver.iters_per_epoch
    ips = steps * spec["batch_hint"] / train_s

    metric = None
    if solver.validator:
        t0 = time.perf_counter()
        metric, _ = solver.eval()
        eval_s = time.perf_counter() - t0
    else:
        eval_s = 0.0

    return {
        "case": name,
        "steps": steps,
        "build_s": round(build_s, 2),
        "train_s": round(train_s, 2),
        "steps_per_s": round(steps / train_s, 2),
        "ips": round(ips, 1),
        "eval_s": round(eval_s, 2),
        "metric": float(metric) if metric is not None else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=str, default=",".join(CASES))
    ap.add_argument("--out", type=str, default="benchmark_results.jsonl")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = []
    for name in args.cases.split(","):
        name = name.strip()
        if name not in CASES:
            print(f"skip unknown case '{name}'")
            continue
        try:
            res = run_case(name, CASES[name])
        except Exception as e:  # keep the sweep alive
            res = {"case": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(res), flush=True)
        results.append(res)
    with open(args.out, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
