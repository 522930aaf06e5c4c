"""Measure what bucketing buys on the fact-fact join (B29 x B7 story).

Writes lineitem/orders as bucketed managed tables via the engine's own
``save_table(bucket_by=...)`` sink, then times the orderkey fact-fact
join + rollup twice — once from raw parquet (both sides exchange) and
once from the bucketed tables (co-located, zero join exchanges) — and
verifies both produce identical results. Prints one JSON line.

    python tools/bucket_bench.py --sf-dir testdata_sf10
    python tools/bucket_bench.py --sf-dir testdata_sf10 --reuse   # skip write

This is the measured form of SCALING.md's claim that at 100 TB you
bucket lineitem/orders on orderkey once and every subsequent fact-fact
join skips its shuffle: the bucket write is one shuffle paid once,
amortized over every downstream join.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_zoomcamp_my_test_spark.session import EngineConfig, get_spark
from data_engineering_zoomcamp_my_test_spark.sinks.writers import save_table


def _fact_join(l, o):
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="reuse existing bucketed tables instead of rewriting them",
    )
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]", shuffle_partitions=cpus, app_name="bucket_bench"
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    tag = re.sub(r"\W+", "_", os.path.basename(os.path.normpath(args.sf_dir)))
    li_name, od_name = f"li_{tag}_b{args.buckets}", f"od_{tag}_b{args.buckets}"

    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(args.sf_dir, "orders.parquet"))

    write_s = None
    if not (args.reuse and spark.catalog.tableExists(li_name)):
        t0 = time.perf_counter()
        save_table(li, li_name, bucket_by=(args.buckets, ["l_orderkey"]))
        save_table(od, od_name, bucket_by=(args.buckets, ["o_orderkey"]))
        write_s = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    plain = sorted(_fact_join(li, od).collect())
    plain_s = round(time.perf_counter() - t0, 1)

    lb, ob = spark.table(li_name), spark.table(od_name)
    t0 = time.perf_counter()
    bucketed = sorted(_fact_join(lb, ob).collect())
    bucketed_s = round(time.perf_counter() - t0, 1)

    plan = _fact_join(lb, ob)._jdf.queryExecution().executedPlan().toString()
    join_exchanges = sum(
        1 for line in plan.splitlines() if "Exchange" in line and "orderkey" in line
    )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "buckets": args.buckets,
                "bucket_write_s": write_s,
                "plain_join_s": plain_s,
                "bucketed_join_s": bucketed_s,
                "speedup": round(plain_s / bucketed_s, 2) if bucketed_s else None,
                "results_equal": plain == bucketed,
                "join_key_exchanges_bucketed": join_exchanges,
            }
        )
    )
    spark.stop()
    return 0 if plain == bucketed and join_exchanges == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
