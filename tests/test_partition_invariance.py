"""Partitioning-invariance: the determinism claim, tested directly.

README ("Correctness model") claims results are bit-identical across
partitionings — the property that makes answers reproducible when the
same query moves from local[8] to a 1000-executor cluster. The oracle
suite can't see a violation that happens to match DuckDB under ONE
layout; this test re-runs representative decls under radically different
physical layouts (scan-split size and shuffle fan-out both changed by
~2 orders of magnitude) and asserts the exact row multiset is unchanged.

Decls are chosen for accumulation risk — the places where a naive plan
is order-dependent:
  b3   decimal-accumulated money sums (grouped agg)
  c41  weighted average (decimal sums then double division)
  c9   lag-gap cumsum sessionization (window over shuffled input)
  c34  RANGE-frame rolling money sums
  c82  interpolated percentiles + band clip
  c49  content-hash-order cumulative token budget
"""

from __future__ import annotations

import pytest

from data_engineering_zoomcamp_my_test_spark.operators import all_queries

DECLS = ["b3_groupby_agg", "c41_weighted_avg", "c9_session",
         "c34_rolling_1h", "c82_winsorize", "c49_token_budget_mix",
         # b13: grouping sets over decimal sums; c37: min_by argmax with
         # tie-break struct; c61: IGNORE-NULLS forward fill over a grid
         # join; c23: as-of union-merge ordering
         "b13_rollup", "c37_tfidf_top_term", "c61_resample_ffill",
         "c23_asof_join",
         # r11 shapes with scalar-threshold / aggregate-equality joins:
         # b51's avg-balance gate, b52's DECIMAL max-equality join-back,
         # b54's 1.5x-mean cut — each must pick the SAME rows under any
         # accumulation order
         "b51_q22_global_cust", "b52_q15_top_supplier",
         "b54_q11_value_share",
         # r12 shapes: b55's decimal-min equality join-back and b59's
         # 2x-mean pair-quantity cut must pick the SAME winner/supplier
         # sets under any accumulation order
         "b55_q2_min_cost_supplier", "b59_q20_semi_chain",
         # c90: 8 rounds of double-sum accumulation (rank contributions)
         # must round to the same 6 decimals under any shuffle order;
         # c91: double BM25 term-sum + corpus-avg doc length likewise
         "c90_pagerank", "c91_bm25",
         # c94: per-partition Arrow partial Grams summed across layouts —
         # the partial count and grouping change entirely between the
         # coarse and fine layouts, the 6dp covariance must not
         "c94_embedding_covariance"]

# (files.maxPartitionBytes, shuffle.partitions): one coarse layout (every
# table a single split, single reducer) and one absurdly fine one (64 KiB
# splits, prime reducer count) — accumulation order differs maximally.
LAYOUTS = [("134217728", "1"), ("65536", "37")]

# Iterative decls whose FINAL frame is localCheckpoint-backed: the plan the
# test inspects is a bare "Scan ExistingRDD" because every shuffle already
# ran (under the configured layout) while materializing the checkpoints.
# The ExistingRDD allowance in the fan-out check applies ONLY to these —
# any other decl whose plan happens to contain one still has to show a
# hash exchange at the configured fan-out.
CHECKPOINT_FINAL_DECLS = {"c90_pagerank"}


def _rows(df):
    # sort key is repr: grouping-set NULLs and nullable fill columns make
    # plain tuple comparison raise (same convention as tests/oracle.py)
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("decl", DECLS)
def test_result_invariant_under_physical_layout(spark, sf_small, decl):
    q = all_queries()[decl]
    conf = spark.conf
    saved = {
        "spark.sql.files.maxPartitionBytes": conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
        "spark.sql.shuffle.partitions": conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
    }
    results = []
    fanouts = []
    try:
        # AQE off so shuffle.partitions is actually honored verbatim and
        # the two layouts really execute with different fan-outs.
        conf.set("spark.sql.adaptive.enabled", "false")
        for mpb, sp in LAYOUTS:
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            conf.set("spark.sql.shuffle.partitions", sp)
            df = q(spark, sf_small)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # fan-out 1 prints as "Exchange SinglePartition", not as
            # "hashpartitioning(..., 1)".  Iterative decls (c90) return a
            # localCheckpoint-backed frame whose FINAL plan is a bare RDD
            # scan — their shuffles ran under the layout during iteration
            # materialization, so a checkpoint scan counts as exercised.
            fanouts.append(
                ("hashpartitioning" in plan and f", {sp})" in plan)
                or (sp == "1" and "Exchange SinglePartition" in plan)
                or (decl in CHECKPOINT_FINAL_DECLS and "Scan ExistingRDD" in plan)
            )
            results.append(_rows(df))
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    # vacuousness guard: each layout's plan must carry at least one hash
    # exchange at ITS configured fan-out — otherwise the two runs did not
    # actually shuffle differently and the invariance check proves nothing
    # (the final stage's getNumPartitions() is no proxy: sorts/final aggs
    # normalize it identically under both layouts).
    assert all(fanouts), (
        f"{decl}: a layout's plan shows no hash exchange at its configured "
        f"fan-out {LAYOUTS} — the invariance check is vacuous"
    )
    assert results[0] == results[1], (
        f"{decl}: result depends on physical layout "
        f"({len(results[0])} vs {len(results[1])} rows or value drift)"
    )
    assert len(results[0]) > 0
