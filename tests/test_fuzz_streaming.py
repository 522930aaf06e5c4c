"""Fixed-seed slice of the streaming-replay fuzzer (tools/fuzz_streaming.py).

Campaign evidence lives in BASELINE.md; this slice pins the generator
contract (determinism, safe-domain invariants for the watermark-lossy
operator families) and drives ONE cheap fixed replay end-to-end so the
fuzzer's compare plumbing stays green in CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_streaming import (
    OPERATORS,
    SESSION_SAFE_WATERMARKS,
    gen_case,
    run_case,
)

SEED = "ci"


def test_case_generator_is_deterministic():
    a = [gen_case(SEED, i) for i in range(40)]
    b = [gen_case(SEED, i) for i in range(40)]
    assert a == b


def test_every_operator_reachable_with_sql_oracle():
    seen = set()
    for name in OPERATORS:
        got, p = gen_case(SEED, 0, ops=[name])
        assert got == name
        sql = OPERATORS[name]["oracle"](p)
        assert sql.strip().upper().startswith(("SELECT", "WITH"))
        seen.add(name)
    assert seen == set(OPERATORS)


def test_lossy_families_stay_inside_exactness_domain():
    """Session and attribution draws must be single-batch or carry a
    watermark covering the ~30-day event span (the measured domain where
    complete-mode/append-mode state loss cannot occur)."""
    for i in range(400):
        name, p = gen_case(SEED, i)
        if name not in ("session", "attribution"):
            continue
        single_batch = p["n_files"] <= p["max_files_per_trigger"]
        assert single_batch or p["watermark"] in SESSION_SAFE_WATERMARKS, (i, p)


def test_sliding_slide_never_exceeds_window():
    for i in range(400):
        name, p = gen_case(SEED, i)
        if name == "sliding":
            assert p["slide_minutes"] <= p["window_minutes"], (i, p)


def test_fixed_cheap_replay_matches_oracle(spark, sf_small):
    """One deterministic tumbling replay through the full fuzzer path
    (land -> stream -> memory sink -> DuckDB compare)."""
    from tests.oracle import compare

    p = {
        "window_minutes": 90,
        "n_files": 4,
        "max_files_per_trigger": 2,  # two genuine micro-batches
        "order": "reverse_time",
        "watermark": "0 seconds",
    }
    df = run_case(spark, sf_small, "tumbling", p, tag="ci")
    res = compare("sfuzz_ci", df, OPERATORS["tumbling"]["oracle"](p), sf_small)
    assert res.ok, res.mismatches
