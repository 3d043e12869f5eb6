"""Targeted sweep of the Pallas jet BACKWARD-kernel knobs on the
piratenet_9x256 bench case (VERDICT r4 next #2: MFU >= 0.5; r5 open item:
the staged backward's recompute + weight-grad accumulation is the wall —
the forward kernel times at ~1.0 ms of a ~3.5 ms step).

Builds the solver ONCE and times flag bundles in-process via
``deriv_path.override`` (one compile per variant instead of one bench
subprocess per variant). All variants extend the ``jet_pallas_full``
candidate (whole net in one kernel, bm=128, split dots) which is the
current measured winner.

Usage: python tools/piratenet_bwd_sweep.py [--steps 400] [--fused 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PSCI_MATMUL_PRECISION", "default")
os.environ.setdefault("PSCI_AUTOTUNE", "0")

from paddlescience_tpu.autodiff import path as deriv_path  # noqa: E402

BASE = dict(deriv_path.CANDIDATES["jet_pallas_full"])

# second pass (2026-08-20): the first sweep's bwd-tile rows were bogus — the
# spec cache keyed (seg, index, bm) without bm_bwd, so every variant reused
# the first-built spec (fixed in arch/mlp.py). Measured then: base 282.1,
# save_bounds 277.2 (HBM boundary traffic costs more than the recompute),
# fwd256 OOMs scoped VMEM at the default 100 MB limit.
VARIANTS = {
    "full(base bm128/split)": {},
    "full+bwd256": {"PSCI_JET_BLOCK_M_BWD": "256"},
    "full+bwd512": {"PSCI_JET_BLOCK_M_BWD": "512"},
    "full+bwd256+fused": {
        "PSCI_JET_BLOCK_M_BWD": "256",
        "PSCI_JET_PALLAS_MATMUL": "fused",
    },
    "full+fwd256+vmem118": {
        "PSCI_JET_BLOCK_M": "256",
        "_env": {"PSCI_JET_VMEM_LIMIT_MB": "118"},
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--fused", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    import jax

    from bench import _flops_of, _peak_flops
    from examples.allen_cahn import build_solver
    from paddlescience_tpu.parallel import mesh as mesh_mod

    solver, _ = build_solver(
        epochs=1, iters_per_epoch=args.steps, batch_size=args.batch,
        eval_during_train=False, with_validator=False, output_dir=None,
        arch="piratenet", piratenet_blocks=9,
    )
    host_batches = {}
    for name, cst in solver.constraint.items():
        if cst.data_iter is not None:
            inp, lab, wgt = next(cst.data_iter)
            host_batches[name] = (
                mesh_mod.shard_batch(inp, solver.mesh),
                mesh_mod.shard_batch(lab, solver.mesh),
                mesh_mod.shard_batch(wgt, solver.mesh),
            )

    peak = _peak_flops()
    fused = args.fused
    n_calls = max(args.steps // fused, 1)
    results = []
    for tag, extra in VARIANTS.items():
        extra = dict(extra)
        env = extra.pop("_env", {})
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        flags = dict(BASE)
        flags.update(extra)
        try:
            with deriv_path.override(flags):
                # spec caches key on flag-resolved (bm, group) tuples, so
                # variants sharing a shape reuse compiled kernels naturally
                scan_fn = solver._build_scanned_train_step_static(
                    fused, host_batches, donate=False)
                t_c = time.perf_counter()
                compiled = scan_fn.lower(solver.state).compile()
                compile_s = time.perf_counter() - t_c
                flops = _flops_of(compiled)
                out, logs = compiled(solver.state)
                jax.block_until_ready(logs["loss"])
                t0 = time.perf_counter()
                for _ in range(n_calls):
                    out, logs = compiled(solver.state)
                jax.block_until_ready(logs["loss"])
                dt = time.perf_counter() - t0
            sps = n_calls * fused / dt
            mfu = flops * sps / peak if (flops and peak) else None
            print(f"[sweep] {tag}: {sps:.1f} steps/s  "
                  f"mfu={mfu:.4f}  flops/step={flops/1e9:.1f}G  "
                  f"ms/step={1e3/sps:.3f}  (compile {compile_s:.0f}s)",
                  flush=True)
            results.append((sps, tag, mfu, flops))
        except Exception as e:
            print(f"[sweep] {tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    results.sort(reverse=True)
    print("\n== ranked by steps/s ==")
    for sps, tag, mfu, flops in results:
        print(f"{sps:8.1f} steps/s  mfu={mfu:.4f}  {tag}")
    if results:
        best = {"steps_per_sec": results[0][0], "variant": results[0][1],
                "mfu": results[0][2]}
        print(json.dumps(best))


if __name__ == "__main__":
    main()
