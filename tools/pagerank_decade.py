"""Reproducible harness for c90_pagerank's decade-scale Spark-side runs.

VERDICT r12 #7: the sf10 single-box ceiling claim (Spark completes in
~868 s with a 48g heap; the default 16g heap OOMs mid-iterations; the
DuckDB unrolled-CTE oracle spills >75 GB and is the real single-box
limit) lived only in BASELINE.md prose. This script pins it as a
re-runnable measurement, bucketed_ab.py-style: one JSON line out.

What it runs: the EXACT decl path (pagerank_copurchase — lineitem
self-join edges, 8 iterations by default, 6dp-rounded output) on the
given sf-dir, then reduces the result to scale-invariant check figures:
node count, SUM(rank) (pre-rounding mass is exactly 1; 6dp rounding
loses at most 5e-7 per node), and the top-1 rank. No full collect — the
driver-side memory cost is three scalar aggregates, so the harness
itself is not part of the ceiling being measured.

Heap note: the per-iteration localCheckpoints keep ~2 x edges +
ranks materialized in block-manager storage; at sf10 (180M directed
edges) that needs more than the repo's default 16g driver heap in
local mode — pass --driver-mem 48g to reproduce the BASELINE.md
number. On a real cluster the same storage spreads across executors,
which is why this is a single-BOX ceiling, not an operator ceiling.

Usage:
    python tools/pagerank_decade.py --sf-dir testdata_sf1
    python tools/pagerank_decade.py --sf-dir testdata_sf10 --driver-mem 48g
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--n-iter", type=int, default=None,
                    help="iteration count (default: the decl's PAGERANK_ITER)")
    ap.add_argument("--driver-mem", default="16g",
                    help="driver heap; sf10 needs 48g (see module docstring)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from data_engineering_zoomcamp_my_test_spark.operators.analytics import (
        PAGERANK_ITER,
        pagerank_copurchase,
    )
    from data_engineering_zoomcamp_my_test_spark.session import EngineConfig, get_spark

    n_iter = args.n_iter if args.n_iter is not None else PAGERANK_ITER
    spark = get_spark(
        EngineConfig(
            master=f"local[{args.cpus}]",
            shuffle_partitions=args.cpus,
            app_name="pagerank_decade",
            driver_memory=args.driver_mem,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    pr = pagerank_copurchase(spark, args.sf_dir, n_iter=n_iter)
    stats = pr.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("pagerank").alias("rank_mass"),
        F.max("pagerank").alias("top_rank"),
    ).head()
    wall = time.monotonic() - t0

    print(json.dumps({
        "metric": "pagerank_decade",
        "sf_dir": args.sf_dir,
        "n_iter": n_iter,
        "driver_mem": args.driver_mem,
        "cpus": args.cpus,
        "value": round(wall, 1),
        "unit": "sec",
        "n_nodes": stats.n_nodes,
        "rank_mass": round(float(stats.rank_mass), 6),
        "top_rank": float(stats.top_rank),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
