"""Skew-handling primitives: salted two-phase aggregation and salted join
must give exactly the plain results on a pathologically skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_zoomcamp_my_test_spark.functions.exprs import money
from data_engineering_zoomcamp_my_test_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed(spark, n=20_000):
    # one key owns 90% of rows
    return spark.createDataFrame(
        [(i, "hot" if i % 10 else f"cold{i % 7}", float(i % 100)) for i in range(n)],
        "id long, k string, v double",
    ).repartition(16)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("v")).cast("double").alias("total"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in salted_aggregate(df, "k", money("v"), n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark, n=5_000)
    dim = spark.createDataFrame(
        [("hot", 1), ("cold1", 2), ("cold2", 3)], "k string, tag int"
    )
    plain = sorted(
        (r.id, r.tag)
        for r in fact.join(dim, "k").select("id", "tag").collect()
    )
    salted = sorted(
        (r.id, r.tag)
        for r in salted_join(fact, dim, "k", "k", n_salts=8)
        .select("id", "tag")
        .collect()
    )
    assert salted == plain


def test_topk_agg_arms_identical_and_window_arm_group_limited(spark):
    """r5: top_k_per_group_agg dispatches by a hot-key probe. Both physical
    arms must return identical rows, and the window arm's plan must carry
    WindowGroupLimit (bounded pre-shuffle state, the point of the arm)."""
    from data_engineering_zoomcamp_my_test_spark.operators.analytics import (
        top_k_per_group_agg,
    )

    rows = [(g, float(100 + (g * 7 + i) % 50), g * 1000 + i)
            for g in range(40) for i in range(1 + (g % 5))]
    rows += [(99, float(i % 37), 99_000 + i) for i in range(400)]  # hot group
    df = spark.createDataFrame(rows, "grp long, val double, id long")

    salted = top_k_per_group_agg(df, "grp", "val", "id", 3, n_salt=8)
    probed = top_k_per_group_agg(df, "grp", "val", "id", 3)  # probe -> window
    key = lambda r: (r.grp, r.rn, r.id, r.val)  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, probed.collect()))

    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    # forcing the hot arm via a tiny threshold must not change results
    hot = top_k_per_group_agg(df, "grp", "val", "id", 3, hot_group_rows=10)
    assert sorted(map(key, hot.collect())) == sorted(map(key, probed.collect()))
