"""Example regression gate — the acceptance mechanism over the example suite.

Replaces import-only checking (VERDICT r2 weak #6): every case actually
RUNS (subprocess-isolated) in a smoke configuration, its returned metric is
compared against the pinned value in ``tools/example_gate_pins.json``, and
the command exits nonzero if any case errors or regresses beyond tolerance.
This is the role of the reference's ``test_tipc/benchmark_train.sh`` +
per-example docs acceptance tables (``docs/zh/examples/*.md``).

Tiers:
  quick  — ~10 canary cases spanning the model families (PINN, operator
           learning, spectral weather, graph, molecular, IDE/fPDE);
           <10 min serially on this host. The CI tier.
  smoke  — tiny overrides (seconds-to-minutes per case on CPU); asserts the
           pinned smoke metric within a tolerance factor (seeded runs are
           deterministic per platform; the factor absorbs BLAS jitter).
           ~97 min serially on a 1-core host; use --jobs on multi-core.
  full   — default configs, no overrides (hours; metric recorded, not
           asserted — full-fidelity numbers are pinned in
           docs/example_metrics.json with hardware tags).

Cases are subprocess-isolated, so --jobs N runs N of them concurrently
(wall-clock divides by min(N, cores); each case is single-process BLAS).

Usage:
  python tools/example_gate.py --tier quick             # CI canaries
  python tools/example_gate.py --tier smoke --jobs 8    # full acceptance
  python tools/example_gate.py --cases laplace2d,viv    # subset
  python tools/example_gate.py --repin                  # refresh pins
  python tools/example_gate.py --one <case> ...         # internal worker
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINS = os.path.join(ROOT, "tools", "example_gate_pins.json")

# smoke-tier CLI overrides per case; _default applies when absent.
# keys must exist in the case's conf (examples/conf/<case>.yaml).
_DEFAULT = ["TRAIN.epochs=2", "TRAIN.iters_per_epoch=4"]
SMOKE_OVERRIDES = {
    "allen_cahn": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=50", "TRAIN.batch_size=512"],
    "allen_cahn_plain": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=50", "TRAIN.batch_size=512"],
    "allen_cahn_causal": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=50", "TRAIN.batch_size=512"],
    "allen_cahn_ntk": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=50", "TRAIN.batch_size=512"],
    "allen_cahn_sota": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=50", "TRAIN.batch_size=512"],
    "laplace2d": ["TRAIN.epochs=3", "TRAIN.iters_per_epoch=20"],
    "euler_beam": ["TRAIN.epochs=5", "TRAIN.iters_per_epoch=20"],
    "ldc2d_unsteady_Re10": ["TRAIN.epochs=2", "TRAIN.iters_per_epoch=1",
                            "TRAIN.ntime_all=4", "TRAIN.npoint_pde=81", "EVAL.eval_batch=512"],
    "cylinder2d_unsteady": ["TRAIN.epochs=2", "TRAIN.iters_per_epoch=2", "TRAIN.npoint_pde=200"],
    "ns_cvit": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=2"],
    "adv_cvit": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=2"],
    "nowcastnet_radar": ["TRAIN.epochs=1"],
    "dgmr": ["TRAIN.epochs=2"],
    "topopt": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=2"],
    "hmc_bayes": ["TRAIN.epochs=1"],
    # LDC curricula: one tiny Re stage (needs dataset/ldc_Re100.npz from
    # tools/gen_ldc_reference.py)
    "ldc_2d_Re3200_piratenet": ["Re=[100]", "epochs=[1]", "TRAIN.iters_per_epoch=4"],
    "ldc_2d_Re3200_sota": ["Re=[100]", "epochs=[1]", "TRAIN.iters_per_epoch=4"],
    "ldc_2d_Re1000_plain": ["Re=[100]", "epochs=[1]", "TRAIN.iters_per_epoch=4"],
    "spinn_helmholtz3d": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=10",
                          "TRAIN.nc=16", "TRAIN.nc_test=20"],
    "deephpms_kdv": ["TRAIN.epochs_idn=2", "TRAIN.epochs_pde=2",
                     "TRAIN.epochs_sol=2", "TRAIN.iters_per_epoch=2"],
    "deephpms_ks": ["TRAIN.epochs_idn=2", "TRAIN.epochs_pde=2",
                    "TRAIN.epochs_sol=2", "TRAIN.iters_per_epoch=2"],
    "deephpms_schrodinger": ["TRAIN.epochs_idn=2", "TRAIN.epochs_pde=2",
                             "TRAIN.epochs_sol=2", "TRAIN.iters_per_epoch=2"],
    "earthformer_sevir": ["TRAIN.epochs=1"],
    "fourcastnet_finetune": ["TRAIN.epochs=1"],
    "moflow_optimize": ["TRAIN.train_steps=10", "TRAIN.fit_steps=30", "TRAIN.opt_steps=5"],
    "darcy_uno": ["TRAIN.epochs=2", "TRAIN.n_train=32", "TRAIN.n_eval=16"],
    "darcy_tfno": ["TRAIN.epochs=2", "TRAIN.n_train=32", "TRAIN.n_eval=16"],
    "phylstm3_seismic": ["TRAIN.steps=40"],
    "amgnet_cylinder": ["TRAIN.steps=20"],
    "phygeonet_bc": ["TRAIN.epochs=200"],
    "deephpms_ns": ["TRAIN.epochs_idn=2", "TRAIN.epochs_pde=2",
                    "TRAIN.iters_per_epoch=2", "TRAIN.nx=48", "TRAIN.nt=9",
                    "TRAIN.n_eval=4096"],
    "allen_cahn_piratenet": ["TRAIN.epochs=1", "TRAIN.iters_per_epoch=20",
                             "TRAIN.batch_size=512", "TRAIN.eval_during_train=false"],
}
# cases whose smoke run cannot complete in the time budget on CPU, or that
# are driven by their own generator scripts — still required to IMPORT and
# expose an entrypoint by tests/test_examples_import.py
SKIP = {}

# quick-tier canaries: one per model family, chosen from the fastest smoke
# runs (pins' seconds field) — ~160 s of work total, <10 min wall serially
QUICK_CASES = [
    "euler_beam",             # 4th-order PINN (jvp fallback path)
    "allen_cahn",             # flagship PINN (jet/causal/GradNorm)
    "ldc2d_steady",           # Navier-Stokes PINN
    "deeponet",               # operator learning
    "sfno_swe",               # spherical spectral weather
    "tgcn_pems",              # graph temporal
    "graphcast",              # GNN weather
    "cgcnn_property",         # crystal-graph molecular
    "volterra_ide",           # integro-differential
    "fractional_poisson_2d",  # fractional PDE
]


def discover_cases():
    examples = os.path.join(ROOT, "examples")
    out = []
    for f in sorted(os.listdir(examples)):
        if f.endswith(".py") and not f.startswith("_") and f != "iops.py":
            out.append(f[:-3])
    return out


def run_one(case: str, tier: str) -> dict:
    """Worker: run a case in-process and print the result marker.
    ``GATE_EXTRA_OVERRIDES`` (space-separated) appends/overrides CLI args —
    the mid-fidelity TPU queue (tools/tpu_midfi.py) uses it to raise
    epochs/dataset sizes above the smoke tier."""
    os.chdir(os.path.join(ROOT, "examples"))
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    sys.path.insert(0, ROOT)
    overrides = [] if tier == "full" else SMOKE_OVERRIDES.get(case, _DEFAULT)
    extra = os.environ.get("GATE_EXTRA_OVERRIDES", "").split()
    sys.argv = [case] + ["mode=train"] + overrides + extra
    import importlib

    t0 = time.perf_counter()
    mod = importlib.import_module(case)
    ret = mod.main_cli()
    dt = time.perf_counter() - t0
    metric = None
    if isinstance(ret, (int, float)) and not isinstance(ret, bool):
        metric = float(ret)
    try:  # record the device the run actually executed on (ADVICE r4 low)
        import jax

        dev = jax.devices()[0]
        hardware = f"{dev.device_kind} ({dev.platform}, {jax.device_count()} device(s))"
    except Exception:
        hardware = "unknown"
    return {"case": case, "metric": metric, "seconds": round(dt, 1),
            "hardware": hardware}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="smoke", choices=["quick", "smoke", "full"])
    ap.add_argument("--cases", default=None)
    ap.add_argument("--repin", action="store_true")
    ap.add_argument("--one", default=None, help="internal: run one case in-process")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--jobs", type=int, default=max(1, min(8, os.cpu_count() or 1)),
                    help="concurrent case subprocesses (cases are isolated)")
    ap.add_argument("--tolerance", type=float, default=2.0,
                    help="fail when metric > pin * tolerance (and warn when "
                         "metric improves by more than the same factor)")
    args = ap.parse_args()

    if args.one:
        res = run_one(args.one, "full" if args.tier == "full" else "smoke")
        print("GATE_RESULT " + json.dumps(res))
        return 0

    if args.cases:
        cases = args.cases.split(",")
    elif args.tier == "quick":
        cases = list(QUICK_CASES)
    else:
        cases = discover_cases()
    pins = {}
    if os.path.exists(PINS):
        with open(PINS) as f:
            pins = json.load(f)

    env = dict(os.environ)
    # CPU-only: drop the axon TPU site dir (its sitecustomize blocks import
    # during tunnel outages and the gate never needs the device) but keep
    # any other PYTHONPATH entries the caller relies on
    keep = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=os.pathsep.join([ROOT] + keep))

    def launch(case):
        cmd = [sys.executable, os.path.abspath(__file__), "--one", case, "--tier", args.tier]
        try:
            return case, subprocess.run(cmd, env=env, capture_output=True, text=True,
                                        timeout=args.timeout, cwd=ROOT)
        except subprocess.TimeoutExpired:
            return case, None

    results, failures = {}, []
    to_run = [c for c in cases if c not in SKIP]
    for case in cases:
        if case in SKIP:
            results[case] = {"case": case, "skipped": SKIP[case]}
            print(f"[gate] {case}: SKIP ({SKIP[case]})")

    from concurrent.futures import ThreadPoolExecutor

    # the pool only dispatches subprocesses — min(jobs, cases) OS processes
    # do the work; on a 1-core host this degrades gracefully to serial
    with ThreadPoolExecutor(max_workers=max(1, args.jobs)) as pool:
        for case, proc in pool.map(launch, to_run):
            if proc is None:
                failures.append(f"{case}: TIMEOUT after {args.timeout}s")
                print(f"[gate] {case}: TIMEOUT")
                continue
            marker = [ln for ln in proc.stdout.splitlines() if ln.startswith("GATE_RESULT ")]
            if proc.returncode != 0 or not marker:
                failures.append(f"{case}: exit {proc.returncode}")
                tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-8:])
                print(f"[gate] {case}: ERROR\n{tail}")
                continue
            res = json.loads(marker[-1][len("GATE_RESULT "):])
            results[case] = res
            pin = pins.get(case, {}).get("metric")
            status = "ok"
            if args.tier != "full" and not args.repin and pin is not None and res["metric"] is not None:
                # threshold = pin + |pin|*(tol-1): equals pin*tol for positive
                # pins and stays meaningful for negative ones (e.g. moflow's NLL)
                if res["metric"] > pin + abs(pin) * (args.tolerance - 1.0) + 1e-12:
                    failures.append(
                        f"{case}: metric {res['metric']:.4g} regressed past pin "
                        f"{pin:.4g} x{args.tolerance}")
                    status = "REGRESSED"
            print(f"[gate] {case}: {status} metric={res['metric']} ({res['seconds']}s)")

    if args.repin and args.tier == "smoke":
        # merge into existing pins so a --cases subset repin never drops
        # the other cases' entries
        new_pins = dict(pins)
        for case, res in results.items():
            if res.get("metric") is not None:
                new_pins[case] = {"metric": res["metric"], "seconds": res["seconds"],
                                  "platform": "cpu", "tier": "smoke"}
            elif case in pins:
                new_pins[case] = pins[case]
        with open(PINS, "w") as f:
            json.dump(new_pins, f, indent=1, sort_keys=True)
        print(f"[gate] wrote {len(new_pins)} pins to {PINS}")

    print(f"[gate] {len(results)} ran, {len(failures)} failures")
    for f_ in failures:
        print("  FAIL:", f_)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
