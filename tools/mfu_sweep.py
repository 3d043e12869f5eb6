"""Sweep the Pallas jet-segment tuning knobs on the piratenet_9x256 bench
case (VERDICT r2 item 5: MFU 0.371 -> target >= 0.5).

Runs bench.py's piratenet case in sequential subprocesses (one TPU client at
a time — concurrent clients deadlock the tunneled chip) across combinations
of segment group size / forward tile / backward tile, and prints a ranked
table. Usage:

    python tools/mfu_sweep.py [--steps 600] [--quick]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRID = {
    "PSCI_JET_PBLOCK_GROUP": ["3", "9"],
    "PSCI_JET_BLOCK_M": ["128", "256", "512"],
    "PSCI_JET_BLOCK_M_BWD": ["64", "128", "256"],
    "PSCI_JET_PALLAS_MATMUL": ["fused", "split"],
}
QUICK = {
    "PSCI_JET_PBLOCK_GROUP": ["3", "9"],
    "PSCI_JET_BLOCK_M": ["256"],
    "PSCI_JET_BLOCK_M_BWD": ["64", "128"],
    "PSCI_JET_PALLAS_MATMUL": ["fused", "split"],
}


def run_one(env_extra, steps):
    env = dict(os.environ)
    env.update(env_extra)
    env.setdefault("PSCI_MATMUL_PRECISION", "default")
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--cases", "piratenet", "--steps", str(steps)]
    try:
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=1500, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not line:
        return {"error": (proc.stdout + proc.stderr).splitlines()[-3:]}
    out = json.loads(line[-1])
    return out.get("cases", {}).get("piratenet_9x256", {"error": "case missing"})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    grid = QUICK if args.quick else GRID
    keys = list(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        env_extra = dict(zip(keys, combo))
        # bwd tile must not exceed fwd tile's padded batch
        if int(env_extra["PSCI_JET_BLOCK_M_BWD"]) > int(env_extra["PSCI_JET_BLOCK_M"]):
            continue
        res = run_one(env_extra, args.steps)
        tag = " ".join(f"{k.split('_')[-1]}={v}" for k, v in env_extra.items())
        if "error" in res:
            print(f"[sweep] {tag}: ERROR {res['error']}")
            continue
        print(f"[sweep] {tag}: {res.get('steps_per_sec_per_chip')} steps/s "
              f"mfu={res.get('mfu')}")
        results.append((res.get("mfu") or 0.0, tag, res))
    results.sort(reverse=True)
    print("\n== ranked ==")
    for mfu, tag, res in results:
        print(f"mfu={mfu:.4f}  {res.get('steps_per_sec_per_chip'):>8} steps/s  {tag}")


if __name__ == "__main__":
    main()
