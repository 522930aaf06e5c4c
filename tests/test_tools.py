"""Round-ritual / perf-gate tooling (VERDICT r4 #6): the gate and sweep diff
are part of the round ritual, so their comparison logic is pinned here —
no Spark session needed."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(mod_name: str):
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(REPO, "tools", f"{mod_name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sweep_snapshot_committed_and_covers_catalog():
    snap_path = os.path.join(REPO, "tools", "sweep_baseline.json")
    assert os.path.exists(snap_path), "ritual snapshot must be committed"
    snap = json.load(open(snap_path))
    sys.path.insert(0, REPO)
    from data_engineering_zoomcamp_my_test_spark.operators import all_queries

    catalog = set(all_queries())
    snapped = set(snap["queries"])
    # Every declared query has a snapshot row (new decls are allowed to lag
    # one ritual run, but the committed state should be in sync).
    assert catalog == snapped, (
        f"snapshot out of sync: missing {sorted(catalog - snapped)}, "
        f"stale {sorted(snapped - catalog)} — rerun tools/round_ritual.py --refresh"
    )


def test_ritual_diff_flags_only_real_regressions(tmp_path, monkeypatch):
    rr = _load("round_ritual")
    snap = json.load(open(os.path.join(REPO, "tools", "sweep_baseline.json")))
    # Pin the SNAPSHOT FILE's epoch to the current on-disk corpus so this
    # test exercises the timing diff, not the epoch guard (the driver may
    # have regenerated testdata since the snapshot was committed; the
    # guard has its own case below). _sweep_diff reads the baseline from
    # rr.SNAPSHOT, so the pin must go through a patched snapshot file —
    # mutating the local dict would be dead code.
    snap["epoch"] = rr._epoch_fingerprint(snap["sf_dir"])
    monkeypatch.setattr(rr, "SNAPSHOT", tmp_path / "snap.json")
    rr.SNAPSHOT.write_text(json.dumps(snap))

    # Identical run: no regressions.
    regs, summary = rr._sweep_diff(json.loads(json.dumps(snap)))
    assert regs == []
    assert "0 regression(s)" in summary

    # 4x on a >floor query fires; 4x on a sub-floor query does not.
    mutated = json.loads(json.dumps(snap))
    slow = max(snap["queries"], key=lambda k: snap["queries"][k])
    fast = min(snap["queries"], key=lambda k: snap["queries"][k])
    mutated["queries"][slow] = snap["queries"][slow] * 4
    mutated["queries"][fast] = min(snap["queries"][fast] * 4, 0.7)
    regs, _ = rr._sweep_diff(mutated)
    assert any(slow in r for r in regs)
    assert not any(fast in r for r in regs)

    # Mismatched sf_dir: diff declines rather than comparing apples/oranges.
    other = json.loads(json.dumps(snap))
    other["sf_dir"] = "/elsewhere/sf9"
    regs, summary = rr._sweep_diff(other)
    assert regs == [] and "diff skipped" in summary


def test_ritual_diff_refuses_stale_epoch(tmp_path, monkeypatch):
    """VERDICT r9 #5: a snapshot taken on a regenerated-away testdata
    epoch must be refused (explicit 'EPOCH CHANGED' skip), not compared
    (phantom 2x regressions). Fingerprint = (name, mtime_ns, size) of the
    corpus parquet files, so a driver regen — same names, new
    mtimes/sizes — flips it."""
    rr = _load("round_ritual")
    d = tmp_path / "sfX"
    d.mkdir()
    (d / "lineitem.parquet").write_bytes(b"v1")
    fp1 = rr._epoch_fingerprint(str(d))
    assert fp1 == rr._epoch_fingerprint(str(d))  # deterministic

    snap = {
        "sf_dir": str(d),
        "epoch": fp1,
        "total_sec": 1.0,
        "queries": {"q": 1.0},
    }
    monkeypatch.setattr(rr, "SNAPSHOT", tmp_path / "snap.json")
    rr.SNAPSHOT.write_text(json.dumps(snap))

    # Same epoch: a 4x slowdown IS flagged.
    run = {"sf_dir": str(d), "total_sec": 4.0, "queries": {"q": 4.0}}
    regs, _ = rr._sweep_diff(run)
    assert regs

    # Regenerate the corpus (new bytes -> new mtime/size): guard fires,
    # the phantom regression is suppressed, the message says re-snapshot.
    (d / "lineitem.parquet").write_bytes(b"v2-regenerated")
    assert rr._epoch_fingerprint(str(d)) != fp1
    regs, summary = rr._sweep_diff(run)
    assert regs == []
    assert "EPOCH CHANGED" in summary and "--refresh" in summary


def test_bench_gate_math():
    bg = _load("bench_gate")
    baseline = bg.load_baseline()
    assert baseline["queries"] and baseline["value"] > 0
    # The gate reads the round-1 json block; bench.py's headline set must
    # still cover every baseline query or the gate reports it missing.
    sys.path.insert(0, REPO)
    import bench

    assert set(baseline["queries"]) <= set(bench.BENCH_QUERIES)


def test_bench_gate_matches_baseline_by_method():
    """ADVICE r8 (medium): bench.py v2 steady-state totals read ~2x below
    the v1 single-shot round-1 record, so gating v2 runs against the v1
    block silently widened the 2x gate to ~4-5x. The gate must select the
    baseline block recorded under the SAME methodology (+ sf), keep the
    v1 block for historical runs, and refuse (not skip) a cross-method
    comparison when the method-matched block is missing."""
    bg = _load("bench_gate")
    blocks = bg.load_baselines()
    methods = {b.get("method", bg.V1_METHOD) for b in blocks}
    # both generations recorded at sf0.1
    assert {bg.V1_METHOD, "steady_state_min_of_2_warmed"} <= methods

    v1 = bg.pick_baseline({"sf": 0.1})
    v2 = bg.pick_baseline({"sf": 0.1, "method": "steady_state_min_of_2_warmed"})
    assert v1 is not None and v1.get("method", bg.V1_METHOD) == bg.V1_METHOD
    assert v2 is not None and v2["method"] == "steady_state_min_of_2_warmed"
    assert v1["value"] > v2["value"], "v1 includes first-execution cost"
    # same headline set in both blocks — the per-query gate stays total
    assert set(v1["queries"]) == set(v2["queries"])
    # unknown method at a recorded sf: no silent fallback to another block
    assert bg.pick_baseline({"sf": 0.1, "method": "v3_imaginary"}) is None


def test_compare_digest_matches_and_detects_divergence(spark):
    """compare_digest agrees with the hash compare on a green decl, and a
    deliberately perturbed oracle makes it FAIL (digest is not vacuous)."""
    from data_engineering_zoomcamp_my_test_spark.operators import (
        all_oracle_sql,
        all_queries,
    )
    from tests.oracle import compare_digest

    sf = "/root/testdata/sf0.001"
    q, o = all_queries(), all_oracle_sql()
    for name in ("b44_win_value_fns", "c61_resample_ffill", "c63_cut_dup_spans"):
        res = compare_digest(name, q[name](spark, sf), o[name], sf)
        assert res.ok, f"{name}: {res.mismatches}"

    # deliberate divergence: shift a column by 1 in the oracle
    bad = f"SELECT o_orderkey + 1 AS o_orderkey, o_custkey, first_price, last_price, second_price FROM ({o['b44_win_value_fns']}) t"
    res = compare_digest("b44_perturbed", q["b44_win_value_fns"](spark, sf), bad, sf)
    assert not res.ok and any("o_orderkey" in m for m in res.mismatches)

    # string-VALUE divergence invisible to length-sum + distinct-count
    # (VERDICT r6 #3): reversing each string preserves both, so only the
    # md5 hash-sum aggregates can flag it.
    bad_s = (
        "SELECT doc_id, reverse(clean_text) AS clean_text, n_removed "
        f"FROM ({o['c63_cut_dup_spans']}) t"
    )
    res = compare_digest("c63_perturbed", q["c63_cut_dup_spans"](spark, sf), bad_s, sf)
    assert not res.ok
    assert all(("h1_" in m) or ("h2_" in m) for m in res.mismatches), res.mismatches


def test_sweep_action_env_validated_before_session(monkeypatch):
    # SPARK_GRAFT_ACTION guards fire before any Spark session is built, so a
    # typo fails in ~0s instead of after a JVM launch (mirrors the
    # SPARK_GRAFT_ONLY / gen_sf --tables validation convention).
    import pytest

    sweep = _load("sweep")
    monkeypatch.setenv("SPARK_GRAFT_ACTION", "materialise")  # typo'd value
    with pytest.raises(SystemExit, match="SPARK_GRAFT_ACTION"):
        sweep.main()


def test_empty_input_grouping_sets_divergence_pinned(spark):
    """Engine-behavior pin for a REAL divergence the differential fuzzer
    found (seed "newshapes", i=33): grouping sets over an EMPTY input.

    Spark returns zero rows for GROUP BY ROLLUP(...)/GROUPING SETS(())
    when the filtered input relation is empty; DuckDB (like PostgreSQL,
    following the standard's GROUPING SETS(()) = global-aggregate reading)
    emits the grand-total row with COUNT=0 / NULL aggregates.  gen_rollup
    therefore generates no WHERE clause; if either engine changes
    behavior, this test fails and the shape can be widened."""
    import duckdb

    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView(
        "li_empty_probe"
    )
    sql = (
        "SELECT l_returnflag AS g0, COUNT(*) AS c FROM {t} "
        "WHERE l_linenumber IS NULL GROUP BY ROLLUP(l_returnflag)"
    )
    assert spark.sql(sql.format(t="li_empty_probe")).count() == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW li_empty_probe AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    rows = con.execute(sql.format(t="li_empty_probe")).fetchall()
    con.close()
    assert rows == [(None, 0)]


def test_fuzzer_unique_keys_validated_against_corpus():
    """build_pools asserts every declared total-order key is duplicate-free
    in the target corpus (the driver regenerates testdata per round), and
    raises on a stale declaration instead of producing phantom divergences."""
    import pytest

    fuzz = _load("fuzz_differential")
    # current declarations hold at sf0.01 (incl. the 3-column lineitem key)
    pools = fuzz.build_pools("/root/testdata/sf0.01")
    assert "lineitem" in pools
    # the pre-fix 2-column lineitem key has ~11.8k duplicate pairs -> raises
    orig = fuzz.TABLES["lineitem"]["unique"]
    try:
        fuzz.TABLES["lineitem"]["unique"] = ["l_orderkey", "l_linenumber"]
        with pytest.raises(ValueError, match="duplicate"):
            fuzz.build_pools("/root/testdata/sf0.01")
    finally:
        fuzz.TABLES["lineitem"]["unique"] = orig


def test_round_tie_divergence_pinned_and_money_grain_safe(spark):
    """Engine-behavior pin for ROUND(double, 6) at exact .5e-6 ties — the
    gray zone that keeps round() out of the fuzzer dialect but underpins
    the c24/c82 published-percentile contract (ADVICE r7).

    Measured divergence (planted probe): round(1.0000025, 6) is 1.000003
    on Spark (BigDecimal.valueOf of the shortest decimal repr, HALF_UP)
    but 1.000002 on DuckDB (scaled binary arithmetic).  So ties are NOT
    portable — the contract is safe only because they are unreachable:
    money-grain inputs (2-decimal values) interpolated at frac = k*0.05
    (the percentile positions c24/c82 use) have true values on a 5e-4
    grid, 5e-7 away from the nearest tie, while the computed double sits
    within ~1e-8 of that grid point.  Both engines therefore always see a
    value strictly on the same side of the tie, where HALF_UP and
    HALF_EVEN agree.  The second half of this test pins that: grid values
    perturbed by +/- 8 ulps (far more than real interpolation error)
    round identically in both engines."""
    import math

    import duckdb

    con = duckdb.connect()

    def both(v: float) -> tuple[float, float]:
        s = spark.sql(f"SELECT round(CAST({v!r} AS DOUBLE), 6)").collect()[0][0]
        d = con.sql(f"SELECT round(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        return s, d

    # 1) the planted tie diverges (if either engine changes, revisit the
    #    dialect exclusion — round() could then be admitted)
    s, d = both(1.0000025)
    assert abs(s - 1.000003) < 1e-12 and abs(d - 1.000002) < 1e-12, (s, d)

    # 2) the reachable class agrees: 2-decimal endpoints, frac = k*0.05
    vals = []
    for lo_c, hi_c, k in [
        (123, 124, 1), (123, 131, 7), (1, 2, 19), (23053, 23057, 11),
        (99999, 100003, 3), (500, 503, 13),
    ]:
        lo, hi = lo_c / 100.0, hi_c / 100.0
        v = lo + (k * 0.05) * (hi - lo)
        for ulps in (-8, -1, 0, 1, 8):
            p = v
            for _ in range(abs(ulps)):
                p = math.nextafter(p, math.inf if ulps > 0 else -math.inf)
            vals.append(p)
    for v in vals:
        s, d = both(v)
        assert s == d, (v.hex(), s, d)
    con.close()


def test_fuzzer_partial_corpus_restricts_generation(tmp_path):
    """On a partial corpus (e.g. an sf100 subset) generators must draw only
    from tables present in the pools, and shapes that need absent tables
    must fail fast with a clear message instead of emitting queries whose
    views were never registered (ADVICE r7)."""
    import random as _random

    import pytest

    fuzz = _load("fuzz_differential")

    (tmp_path / "documents.parquet").symlink_to("/root/testdata/sf0.001/documents.parquet")
    pools = fuzz.build_pools(str(tmp_path))
    assert set(pools) == {"documents"}

    # single-table shapes only ever reference the present table
    for i in range(25):
        sql = fuzz.gen_query("partial", i, pools, shapes=["project", "agg", "orderlimit"])
        assert "FROM documents" in sql, sql

    rng = _random.Random(0)
    with pytest.raises(ValueError, match="JOIN_EDGES"):
        fuzz._edge(rng, pools)
    with pytest.raises(ValueError, match="JOIN_CHAINS"):
        fuzz._chain(rng, pools)
    with pytest.raises(ValueError, match=">= 2 tables"):
        fuzz._sample_two(rng, pools)
    with pytest.raises(ValueError, match="timestamp"):
        fuzz.gen_date_bucket(rng, pools)

    # and on a FULL corpus the filtered lists are identical to the
    # unfiltered ones, so seed:index sequences are unchanged
    full = fuzz.build_pools("/root/testdata/sf0.001")
    assert fuzz._tables(full) == list(fuzz.TABLES)


def test_boxstate_probe_shape():
    """tools/boxstate.py: contention probe emits sane, bounded fields.

    The probe exists because round-8 bench runs on an "idle" box spread
    26.0/32.0/39.5s while steady-state per-query times matched the round-1
    baseline — measured cause: time-varying hypervisor steal (11.1% at the
    worst sample).  The probe's numbers feed the ritual's evidence block,
    so pin the schema and value ranges (not the actual contention, which
    is the host's business).
    """
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import boxstate

    out = boxstate.probe(seconds=0.4, procs=2)
    assert out["metric"] == "boxstate"
    assert out["procs"] == 2
    for k in ("steal_pct", "user_pct", "idle_pct"):
        assert 0.0 <= out[k] <= 100.0, (k, out)
    assert out["core_iters_min_M"] <= out["core_iters_max_M"]
    assert out["core_spread"] is None or out["core_spread"] >= 1.0
    assert out["single_core_Miters_per_sec"] > 0


def test_parity_sweep_rejects_comparator_unsafe_decl(spark):
    """VERDICT r8 #3: the seat pre-verifier must reject nested-typed output.

    Round 8 shipped c38/c39 "pre-verified hash-green" while the DRIVER's
    comparator crashed on their array cells (TypeError: unhashable
    numpy.ndarray inside its pandas _canon) — the repo sweep list-ified
    arrays, so its green was true but not predictive.  The guard mirrors
    the driver's known limits: top-level ArrayType/MapType/StructType
    columns are rejected at seat-preverify time, and this test fails on
    exactly the decl shape that shipped broken.
    """
    from pyspark.sql import functions as F

    from tests.oracle import comparator_unsafe_fields

    # the r8 failure shape: array-valued projection
    bad = spark.range(3).select(
        "id",
        F.array(F.lit(1), F.lit(2)).alias("vec"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
    )
    assert comparator_unsafe_fields(bad.schema) == ["vec", "m"]

    # the fixed shape: posexploded scalar rows pass the guard
    ok = spark.range(3).select(
        "id", F.posexplode(F.array(F.lit(1), F.lit(2))).alias("pos", "v")
    )
    assert comparator_unsafe_fields(ok.schema) == []

    # and the guard is actually wired into the sweep's compare path
    src = open(os.path.join(REPO, "tools", "parity_sweep.py")).read()
    assert "comparator_unsafe_fields" in src, (
        "parity_sweep must reject comparator-unsafe decls before compare"
    )


def test_coverage_doc_lists_every_declared_query():
    """VERDICT r8 #6: COVERAGE.md silently lagged the catalog (b49 was
    registered without a row). The doc is the judge's coverage map, so
    pin it to the registry: every all_queries() key must appear as a
    backticked decl name somewhere in COVERAGE.md."""
    sys.path.insert(0, REPO)
    from data_engineering_zoomcamp_my_test_spark.operators import all_queries

    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [n for n in all_queries() if f"`{n}`" not in cov]
    assert not missing, f"COVERAGE.md lacks rows for {missing}"


def test_ritual_box_note_survives_none_probe_fields():
    """ADVICE r8: core_spread=None (lo==0 guard) or steal_pct=None must
    not abort the ritual at the gate step — the note renders n/a."""
    rr = _load("round_ritual")
    note = rr._box_note(
        {"steal_pct": None, "core_spread": None},
        {"steal_pct": 2.5},
        {"steal_pct": None},
    )
    assert "n/a" in note and "2.5%" in note
    note2 = rr._box_note(
        {"steal_pct": 1.0, "core_spread": 1.23},
        {"steal_pct": 0.0},
        {"steal_pct": 3.0},
    )
    assert "1.23x" in note2 and "None" not in note2


def test_lsh_pairs_check_moments_match_brute_force():
    """tools/lsh_pairs_check.py layer 2: the analytic no-enumeration
    moment computation (rank-weighted intra sums, S_A*S_B cross
    factorization) must equal brute-force pair enumeration for random
    copy-group/rep-pair configurations — this is what makes the sf100
    2.75B-pair exactness claim checkable without materializing pairs."""
    import random

    lpc = _load("lsh_pairs_check")
    rng = random.Random(99)
    for _ in range(10):
        ids = list(range(1, 120))
        rng.shuffle(ids)
        groups, i = [], 0
        while i < len(ids):
            g = rng.randint(1, 5)
            groups.append((f"t{len(groups)}", sorted(ids[i : i + g])))
            i += g
        by_rep = {g[1][0]: g[1] for g in groups}
        reps = sorted(by_rep)
        rep_pairs = set()
        for _ in range(rng.randint(0, 6)):
            a, b = rng.sample(reps, 2)
            rep_pairs.add((min(a, b), max(a, b)))
        pairs = set()
        for _, g in groups:
            for x in range(len(g)):
                for y in range(x + 1, len(g)):
                    pairs.add((g[x], g[y]))
        for ra, rb in rep_pairs:
            for a in by_rep[ra]:
                for b in by_rep[rb]:
                    pairs.add((min(a, b), max(a, b)))
        bf = {
            "n_pairs": len(pairs),
            "sum_a": sum(a for a, b in pairs),
            "sum_b": sum(b for a, b in pairs),
            "sum_aa": sum(a * a for a, b in pairs),
            "sum_bb": sum(b * b for a, b in pairs),
            "sum_ab": sum(a * b for a, b in pairs),
            "min_a": min((a for a, b in pairs), default=None),
            "max_b": max((b for a, b in pairs), default=None),
        }
        assert lpc._ref_moments(groups, rep_pairs) == bf
