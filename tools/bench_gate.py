"""Bench regression gate: compare a bench result against BASELINE.md.

The perf contract (BASELINE.md, "bench gate" row) is: every headline query
stays within 2x of the recorded round-1 baseline at the same scale factor.
This script makes that gate self-enforcing instead of judge-enforced.

Usage:
    python tools/bench_gate.py BENCH_r03.json      # driver-recorded format
    python bench.py | python tools/bench_gate.py   # raw bench.py JSON line

Exit status: 0 = every query within the gate, 1 = at least one query >2x its
baseline (or total >2x), 2 = input could not be parsed.

The baseline numbers are read from the ```json blocks in BASELINE.md and
matched to the bench result by METHODOLOGY and scale factor (ADVICE r8):
bench.py v1 single-shot runs gate against the round-1 v1 block; v2
steady-state runs (``"method": "steady_state_min_of_2_warmed"``) gate
against the round-8 v2 block. Comparing across methods silently rescales
the 2x gate (v2 totals read ~2x below v1 on the same engine), so a
missing method-matched block at the bench's sf is an error, not a skip.
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


# Method label for records that predate the `method` field (v1: one warm
# single-shot run per query, first-execution JIT/plan setup included).
V1_METHOD = "v1_single_shot"


def load_baselines() -> list[dict]:
    """Every bench-shaped ```json block in BASELINE.md, oldest first."""
    text = (REPO_ROOT / "BASELINE.md").read_text()
    blocks = []
    for m in re.finditer(r"```json\n(.*?)```", text, re.DOTALL):
        obj = json.loads(re.sub(r"\n(?!$)", " ", m.group(1)))
        if obj.get("metric") == "total_bench_wall_clock" and "queries" in obj:
            blocks.append(obj)
    if not blocks:
        raise SystemExit("BASELINE.md has no bench ```json block")
    return blocks


def pick_baseline(bench: dict) -> dict | None:
    """The baseline recorded under the SAME methodology and sf, or None."""
    method = bench.get("method", V1_METHOD)
    for b in load_baselines():
        if b.get("method", V1_METHOD) == method and b.get("sf") == bench.get("sf"):
            return b
    return None


def load_baseline() -> dict:
    """Back-compat single-block accessor (the v1 round-1 record)."""
    return load_baselines()[0]


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
    bench = load_bench(sys.argv[1] if len(sys.argv) > 1 else None)
    baseline = pick_baseline(bench)
    method = bench.get("method", V1_METHOD)
    if baseline is None:
        if any(b.get("sf") == bench.get("sf") for b in load_baselines()):
            # sf is covered but not under this methodology: comparing would
            # silently rescale the gate (ADVICE r8) — that's a setup error.
            print(
                f"bench_gate: no BASELINE.md block with method={method!r} at "
                f"sf={bench.get('sf')}; record one — cross-method comparison "
                "is not a gate."
            )
            return 2
        print(
            f"bench_gate: no baseline at sf={bench.get('sf')} — gate only "
            "applies at a recorded scale factor; skipping."
        )
        return 0
    print(f"bench_gate: method={method} sf={bench.get('sf')}")

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
