"""Merge docs/example_metrics_tpu.json (mid-fidelity TPU sweep results) into
docs/example_metrics.json with hardware/date/command provenance.

Every finished case gets a ``tpu_midfi`` provenance field. The headline
``value``/``hardware`` is replaced only when the existing pin is a CPU smoke
number — existing TPU pins (full-recipe runs like the LDC curriculum or the
flagship seeds) are never downgraded by a mid-fidelity result.
"""

import json

SRC = "docs/example_metrics_tpu.json"
DST = "docs/example_metrics.json"

src = json.load(open(SRC))
dst = json.load(open(DST))

merged = promoted = 0
for case, r in sorted(src.items()):
    m = r.get("metric")
    if m is None or r.get("error"):
        continue
    e = dst.setdefault(case, {})
    e["tpu_midfi"] = {
        "metric": m,
        "overrides": r.get("overrides", ""),
        "hardware": r.get("hardware", ""),
        "date": r.get("date", ""),
        "seconds": r.get("seconds"),
    }
    merged += 1
    hw = str(e.get("hardware", ""))
    if "TPU" not in hw or "smoke" in str(e.get("value", "")).lower():
        e["value"] = f"{m:.4g} @ mid-fidelity TPU run ({r.get('overrides') or 'case defaults'})"
        e["hardware"] = r.get("hardware", "TPU (midfi sweep)")
        e["date"] = r.get("date", "")
        e["command"] = f"python tools/tpu_midfi.py --cases {case}"
        promoted += 1
        print(f"PROMOTED {case}: {m:.6g}")
    else:
        print(f"recorded {case}: {m:.6g} (headline pin kept: {hw})")

json.dump(dst, open(DST, "w"), indent=1, sort_keys=True)
print(f"merged {merged}, promoted {promoted}")
