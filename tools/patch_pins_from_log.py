"""Refresh example_gate pins for specific cases from a gate log.

Usage: python tools/patch_pins_from_log.py <gate_log> case1,case2,...

Reads "[gate] <case>: ok|REGRESSED|IMPROVED metric=<m> (<s>s)" lines and
rewrites those cases' entries in tools/example_gate_pins.json. Use ONLY for
cases whose metric legitimately changed (recipe/semantics updates) — never
to paper over an unexplained regression.
"""

import json
import re
import sys

LOG, CASES = sys.argv[1], set(sys.argv[2].split(","))
PINS = "tools/example_gate_pins.json"

pat = re.compile(r"\[gate\] (\S+): (?:ok|REGRESSED|IMPROVED|WARN\S*) metric=([\d.eE+-]+) \(([\d.]+)s\)")
found = {}
for line in open(LOG):
    m = pat.search(line)
    if m and m.group(1) in CASES:
        found[m.group(1)] = (float(m.group(2)), float(m.group(3)))

pins = json.load(open(PINS))
for case, (metric, secs) in sorted(found.items()):
    old = pins.get(case, {}).get("metric")
    pins[case] = {"metric": metric, "platform": "cpu", "seconds": secs, "tier": "smoke"}
    print(f"{case}: {old} -> {metric}")
missing = CASES - set(found)
if missing:
    print("NOT FOUND in log:", sorted(missing))
json.dump(pins, open(PINS, "w"), indent=1, sort_keys=True)
