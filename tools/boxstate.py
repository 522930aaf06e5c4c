"""Box-state probe: quantify host contention before trusting wall-clock.

Round-8 finding: identical back-to-back ``bench.py`` runs on an "idle" box
read 26.0s / 32.0s / 39.5s while the warm full-catalog sweep matched its
committed snapshot — the spread was the HOST, not the engine.  A 5-second
full-load burn measured **11.1% hypervisor steal** and a **1.55x per-core
throughput spread** (13.3M vs 20.6M iters/core of the same loop).  Every
timing in BASELINE.md is only as good as the box it ran on, so this probe
makes box state a recorded fact instead of an assumed constant:

    python tools/boxstate.py            # one JSON line
    python tools/boxstate.py --seconds 5

Emits: steal/user/idle shares of a full-load burn (from /proc/stat deltas),
per-core throughput min/max/ratio, and a single-core calibration rate
(iters/sec of a fixed arithmetic loop) comparable across rounds.
``tools/round_ritual.py`` runs it before and after the bench step and
records both lines next to the gate verdict, so a FAIL on a stolen box is
adjudicable from the evidence block alone.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _cpu_shares() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _burn(seconds: float) -> int:
    t_end = time.time() + seconds
    x = 0
    while time.time() < t_end:
        x += 1
    return x


def _burn_star(args) -> int:
    return _burn(args)


def probe(seconds: float = 3.0, procs: int | None = None) -> dict:
    procs = procs or mp.cpu_count()
    # Single-core calibration first, on a quiet box if we have one: a fixed
    # pure-Python loop whose iters/sec is comparable across rounds (same
    # interpreter, same box class).
    single = _burn(max(1.0, seconds / 3))
    single_rate = round(single / max(1.0, seconds / 3) / 1e6, 2)

    before = _cpu_shares()
    with mp.Pool(procs) as pool:
        per_core = pool.map(_burn_star, [seconds] * procs)
    after = _cpu_shares()

    delta = [b - a for a, b in zip(before, after)]
    total = sum(delta) or 1
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    shares = {n: round(100.0 * v / total, 1) for n, v in zip(names, delta)}
    lo, hi = min(per_core), max(per_core)
    return {
        "metric": "boxstate",
        "procs": procs,
        "burn_sec": seconds,
        "steal_pct": shares["steal"],
        "user_pct": shares["user"],
        "idle_pct": shares["idle"],
        "core_iters_min_M": round(lo / 1e6, 2),
        "core_iters_max_M": round(hi / 1e6, 2),
        "core_spread": round(hi / lo, 2) if lo else None,
        "single_core_Miters_per_sec": single_rate,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--procs", type=int, default=None)
    args = ap.parse_args()
    print(json.dumps(probe(args.seconds, args.procs)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
