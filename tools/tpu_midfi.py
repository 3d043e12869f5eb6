"""Mid-fidelity TPU accuracy runs for the operator/weather/data-driven band.

VERDICT r3 item 6: most pins were smoke-tier CPU toys. This queue runs each
case ON THE TPU at raised fidelity (10-100x the smoke work: full default
recipes or scaled-up epochs/datasets — still below the reference's
multi-day "full" tier) and records the returned metric with hardware/date
into ``docs/example_metrics_tpu.json`` for manual merge into the registry.

ONE case at a time (a second client on the tunneled chip deadlocks it).

Usage: python tools/tpu_midfi.py [--cases a,b,c] [--timeout 1500]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# case -> (tier, extra CLI overrides) — "full" means the case's default
# config; overrides raise fidelity beyond it where defaults are CPU-sized.
# r5 targets reference-class outcomes (VERDICT r4 next #4): darcy at the
# reference H1/posenc recipe over 1000 samples, tgcn at the reference
# 200-epoch L1 recipe, operator/PINN staples at their full defaults.
CASES = {
    "darcy_tfno": ("full", ""),           # defaults = reference recipe (300 ep, 1000 samples)
    "darcy_uno": ("full", ""),
    "tgcn_pems": ("full", "TRAIN.epochs=200"),  # reference run.yaml epochs
    "sfno_swe": ("full", "TRAIN.epochs=50"),
    "fourcastnet": ("full", "TRAIN.epochs=50"),
    "deepcfd_unetex": ("full", "TRAIN.epochs=100"),
    "topopt": ("full", "TRAIN.epochs=60"),
    "phycrnet_burgers": ("full", ""),
    "dgmr": ("full", "TRAIN.epochs=25"),
    "nowcastnet_radar": ("full", "TRAIN.epochs=15"),
    "earthformer_enso": ("full", "TRAIN.epochs=30"),
    "earthformer_sevir": ("full", "TRAIN.epochs=10"),
    "velocitygan_fwi": ("full", "TRAIN.epochs=60"),
    "lorenz_koopman": ("full", "TRAIN.epochs=100"),
    "extformer_moe_enso": ("full", "TRAIN.epochs=20"),
    # operator / PINN staples at full default schedules
    "deeponet": ("full", ""),
    "brusselator3d_lno": ("full", ""),
    "spinn_helmholtz3d": ("full", ""),
    "laplace2d": ("full", ""),
    "euler_beam": ("full", ""),
    "burgers": ("full", ""),
    "heat_pinn": ("full", ""),
    "ldc2d_steady": ("full", ""),
}

OUT = os.path.join(ROOT, "docs", "example_metrics_tpu.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    cases = args.cases.split(",") if args.cases else list(CASES)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    gate = os.path.join(ROOT, "tools", "example_gate.py")
    for case in cases:
        tier, extra = CASES[case]
        env = dict(os.environ)
        env["GATE_EXTRA_OVERRIDES"] = extra
        env["PYTHONPATH"] = os.pathsep.join(
            [ROOT] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
        print(f"[midfi] {case} ({tier}; {extra or 'defaults'}) ...", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, gate, "--one", case, "--tier", tier],
                env=env, capture_output=True, text=True, timeout=args.timeout, cwd=ROOT)
        except subprocess.TimeoutExpired:
            print(f"[midfi] {case}: TIMEOUT {args.timeout}s", flush=True)
            results[case] = {"error": f"timeout {args.timeout}s"}
            continue
        marker = [ln for ln in proc.stdout.splitlines() if ln.startswith("GATE_RESULT ")]
        if proc.returncode != 0 or not marker:
            tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-6:])
            print(f"[midfi] {case}: ERROR\n{tail}", flush=True)
            results[case] = {"error": f"exit {proc.returncode}"}
        else:
            res = json.loads(marker[-1][len("GATE_RESULT "):])
            # hardware comes from the worker's own jax.devices() report
            # (example_gate.run_one), so an accidental CPU fallback is visible
            res.setdefault("hardware", "unknown")
            res.update(
                date=datetime.date.today().isoformat(),
                overrides=extra or "(case defaults)",
            )
            results[case] = res
            print(f"[midfi] {case}: metric={res['metric']} ({res['seconds']}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(f"[midfi] wrote {OUT}")


if __name__ == "__main__":
    main()
