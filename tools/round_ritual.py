"""Round-end ritual: bench -> gate -> full-catalog sweep -> BASELINE.md note.

VERDICT r4 #6 asked for the perf tooling to be wired into the round ritual so
gate-pass lines are produced by the tool, not by hand. One command does it:

    python tools/round_ritual.py --round 5

Steps (each prints its evidence; exit nonzero on any gate failure):

0. **box state** — ``tools/boxstate.py`` before and after the bench step
   (hypervisor steal %, per-core throughput spread), recorded next to the
   gate verdict so a timing anomaly on a stolen box is adjudicable from
   the evidence block alone (round-8 finding: 11.1% steal, 1.55x spread).
1. **bench** — run ``bench.py`` at $SPARK_GRAFT_SF_DIR (default sf0.1) and
   capture its one-line JSON.
2. **gate** — feed that result through ``tools/bench_gate.py`` (2x-of-round-1
   contract). If a driver-recorded ``BENCH_r{N}.json`` exists for the given
   round it is gated too.
3. **sweep** — run ``tools/sweep.py`` (every declared query, warm session),
   diff against the committed snapshot ``tools/sweep_baseline.json``; any
   decl >2x its snapshot AND >0.75s absolute is a regression. ``--refresh``
   rewrites the snapshot after a clean run (do this only when the slowdown
   is an accepted design change, and say so in the commit).
4. **record** — append a dated, tool-generated summary block to BASELINE.md.

The snapshot file is committed so the comparison is against the last
*accepted* state, not whatever ran most recently.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SNAPSHOT = REPO / "tools" / "sweep_baseline.json"
GATE_RATIO = 2.0
ABS_FLOOR_SEC = 0.75


def _run_json(cmd: list[str], marker: str = '"queries"') -> dict:
    """Run a tool that prints one JSON line (amid possible log noise)."""
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=False
    )
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{") and marker in line:
            return json.loads(line)
    raise SystemExit(
        f"ritual: {' '.join(cmd)} produced no JSON line "
        f"(exit {proc.returncode}); stderr tail:\n{proc.stderr[-2000:]}"
    )


def _box_note(box_before: dict, box_after: dict, bench: dict) -> str:
    """Contention evidence line for the gate step.

    ADVICE r8: boxstate.probe() returns core_spread=None when the slowest
    core measured 0 iters, and bench steal_pct can be None — formatting
    either with :.1f/:.2f would TypeError and abort the ritual at the
    gate step. Absent probes render as n/a instead of crashing."""

    def _pct(v) -> str:
        return f"{v:.1f}%" if isinstance(v, (int, float)) else "n/a"

    spread = box_before.get("core_spread")
    return (
        f" (box: steal {_pct(box_before.get('steal_pct'))}->"
        f"{_pct(box_after.get('steal_pct'))}, in-run "
        f"{_pct(bench.get('steal_pct'))}, core spread "
        + (f"{spread:.2f}x)" if isinstance(spread, (int, float)) else "n/a)")
    )


def _gate(src_path: str | None, stdin_payload: str | None = None) -> bool:
    cmd = [sys.executable, "tools/bench_gate.py"]
    if src_path:
        cmd.append(src_path)
    proc = subprocess.run(
        cmd, cwd=REPO, input=stdin_payload, capture_output=True, text=True
    )
    sys.stdout.write(proc.stdout)
    return proc.returncode == 0


def _epoch_fingerprint(sf_dir: str) -> str:
    """Identity of the testdata epoch the timings were measured against:
    a digest over (name, mtime_ns, size) of the corpus parquet files.

    VERDICT r9 #5: the driver regenerates /root/testdata between (and
    sometimes mid-) rounds. Pinned timing snapshots taken on the old
    values silently invalidate — a regenerated corpus can shift per-decl
    timings enough to read as phantom 2x regressions. Fingerprinting the
    epoch into the snapshot turns that silent lie into an explicit
    'epoch changed, re-snapshot' skip."""
    import hashlib

    h = hashlib.sha256()
    try:
        for name in sorted(os.listdir(sf_dir)):
            if not name.endswith(".parquet"):
                continue
            st = os.stat(os.path.join(sf_dir, name))
            h.update(f"{name}:{st.st_mtime_ns}:{st.st_size};".encode())
    except OSError as exc:
        return f"unreadable:{exc}"
    return h.hexdigest()[:16]


def _sweep_diff(sweep: dict) -> tuple[list[str], str]:
    """Compare a sweep result to the committed snapshot.

    Returns (regressions, summary_line).
    """
    if not SNAPSHOT.exists():
        return [], "no sweep snapshot yet (first ritual run creates it)"
    base = json.loads(SNAPSHOT.read_text())
    if base.get("sf_dir") != sweep.get("sf_dir"):
        return [], (
            f"sweep sf_dir={sweep.get('sf_dir')} != snapshot "
            f"sf_dir={base.get('sf_dir')}; diff skipped"
        )
    snap_epoch = base.get("epoch")
    cur_epoch = _epoch_fingerprint(sweep.get("sf_dir", ""))
    if snap_epoch is not None and snap_epoch != cur_epoch:
        return [], (
            f"EPOCH CHANGED ({snap_epoch} -> {cur_epoch}): the testdata "
            "under the snapshot was regenerated; timing diff skipped — "
            "re-run with --refresh to re-snapshot on the new epoch"
        )
    regressions: list[str] = []
    worst_name, worst_ratio = "", 0.0
    for name, base_sec in base["queries"].items():
        got = sweep["queries"].get(name)
        if not isinstance(got, (int, float)) or not isinstance(
            base_sec, (int, float)
        ):
            continue
        ratio = got / base_sec if base_sec else float("inf")
        if ratio > worst_ratio and got > ABS_FLOOR_SEC:
            worst_name, worst_ratio = name, ratio
        if ratio > GATE_RATIO and got > ABS_FLOOR_SEC:
            regressions.append(
                f"{name}: {got:.2f}s vs snapshot {base_sec:.2f}s ({ratio:.2f}x)"
            )
    new = [n for n in sweep["queries"] if n not in base["queries"]]
    summary = (
        f"{len(sweep['queries'])} decls in {sweep['total_sec']:.1f}s "
        f"(snapshot {base['total_sec']:.1f}s); "
        f"{len(regressions)} regression(s) past {GATE_RATIO}x; "
        f"worst mover {worst_name} {worst_ratio:.2f}x"
        + (f"; {len(new)} new decl(s): {', '.join(sorted(new))}" if new else "")
    )
    return regressions, summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None, help="round number, for the BENCH_r{N}.json lookup and the BASELINE.md note")
    ap.add_argument("--refresh", action="store_true", help="rewrite tools/sweep_baseline.json from this run (accepted-change ack)")
    ap.add_argument("--skip-sweep", action="store_true", help="bench+gate only")
    ap.add_argument("--no-record", action="store_true", help="don't append to BASELINE.md")
    args = ap.parse_args()

    lines: list[str] = []
    ok = True

    print("== ritual step 0/4: box state ==", flush=True)
    box_before = _run_json([sys.executable, "tools/boxstate.py"], marker='"boxstate"')
    print(json.dumps(box_before))

    print("\n== ritual step 1/4: bench.py ==", flush=True)
    bench = _run_json([sys.executable, "bench.py"])
    print(json.dumps(bench))
    box_after = _run_json([sys.executable, "tools/boxstate.py"], marker='"boxstate"')

    print("\n== ritual step 2/4: bench gate ==", flush=True)
    box_note = _box_note(box_before, box_after, bench)
    if _gate(None, stdin_payload=json.dumps(bench)):
        lines.append(
            f"local bench {bench['value']:.2f}s @ sf{bench['sf']}: gate PASS"
            + box_note
        )
    else:
        ok = False
        lines.append(
            f"local bench {bench['value']:.2f}s @ sf{bench['sf']}: gate FAIL"
            + box_note
        )
    if args.round is not None:
        drv = REPO / f"BENCH_r{args.round:02d}.json"
        if drv.exists():
            print(f"-- driver-recorded {drv.name} --")
            if _gate(str(drv)):
                lines.append(f"{drv.name}: gate PASS")
            else:
                ok = False
                lines.append(f"{drv.name}: gate FAIL")
        else:
            lines.append(f"{drv.name}: not yet recorded by driver")

    if not args.skip_sweep:
        print("\n== ritual step 3/4: full-catalog sweep ==", flush=True)
        sweep = _run_json([sys.executable, "tools/sweep.py"])
        regressions, summary = _sweep_diff(sweep)
        print(summary)
        for r in regressions:
            print("  REGRESSION", r)
        lines.append(f"sweep: {summary}")
        if regressions and not args.refresh:
            ok = False
        if args.refresh or not SNAPSHOT.exists():
            sweep["epoch"] = _epoch_fingerprint(sweep.get("sf_dir", ""))
            SNAPSHOT.write_text(json.dumps(sweep, indent=1, sort_keys=True) + "\n")
            lines.append(f"sweep snapshot {'refreshed' if args.refresh else 'created'} ({SNAPSHOT.name})")

    if not args.no_record:
        print("\n== ritual step 4/4: record ==", flush=True)
        tag = f"round {args.round}" if args.round is not None else "ad hoc"
        stamp = datetime.date.today().isoformat()
        block = (
            f"\n### Ritual ({tag}, {stamp}, tool-generated by tools/round_ritual.py)\n\n"
            + "".join(f"- {ln}\n" for ln in lines)
        )
        with open(REPO / "BASELINE.md", "a") as fh:
            fh.write(block)
        print(block)

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
