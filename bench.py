"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall-clock seconds.

Each query is a full execute (results drained via count on the final plan,
no driver-side materialization of payload rows beyond the driver's own
collect semantics)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_zoomcamp_my_test_spark.operators import all_queries
from data_engineering_zoomcamp_my_test_spark.session import EngineConfig, get_spark

# Headline set: scan-agg, multiway join, window, dedup, similarity, events.
BENCH_QUERIES = [
    "b3_groupby_agg",
    "b7_join_multiway",
    "b10_join_range",
    "b14_win_rank",
    "b16_win_frame",
    "b18_topk",
    "c1_dedup_exact",
    "c3_cosine_topk",
    "c5_text_stats",
    "c7_tumbling",
    "c9_session",
    "c10_json_extract",
    "c23_asof_join",
    "c33_minhash_jvm",
    "c34_rolling_1h",
    "c37_tfidf_top_term",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            app_name="bench",
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen warmup on the smallest SF so measurements reflect the
    # engine, not first-call JIT. Prefer the tiny sf0.001 set; fall back to
    # the bench target so the harness works on machines without
    # /root/testdata (same portability contract as tools/sweep.py).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    queries["b3_groupby_agg"](spark, warm_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
