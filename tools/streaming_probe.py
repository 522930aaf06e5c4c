"""Round-13 streaming-replay cost breakdown (guide §1).

The streaming decls (c66/c78/c80/c86/c87/c88/c89) replay a bounded
file-drop directory through real micro-batches. Their wall-clock is NOT a
single query plan — it decomposes into:

  land    re-landing the events table as drop files (batch write)
  drive   N micro-batches: per-epoch planning + state-store lifecycle
          (providers x shuffle partitions) + foreachBatch sink writes
  read    reading the final state / epoch dirs back

This tool times each decl end-to-end and, for a chosen decl, the land
phase separately, plus reports the per-run micro-batch count from
``LAST_RUN_BATCHES`` — the denominator for per-epoch overhead claims.

Usage:
    python tools/streaming_probe.py --names c66_streaming_tumbling,c87_streaming_dedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_my_test_spark.operators import all_queries
from data_engineering_zoomcamp_my_test_spark.session import EngineConfig, get_spark

STREAMING_DECLS = [
    "c66_streaming_tumbling",
    "c78_streaming_session",
    "c80_streaming_sliding",
    "c86_streaming_attribution",
    "c87_streaming_dedup",
    "c88_streaming_ledger",
    "c89_streaming_upsert",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=",".join(STREAMING_DECLS))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            app_name="streaming_probe",
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    from data_engineering_zoomcamp_my_test_spark.streaming.windows import (
        LAST_RUN_BATCHES,
    )

    out: dict[str, dict] = {}
    for name in args.names.split(","):
        if not name:
            continue
        best = None
        batches = None
        for i in range(max(1, args.reps)):
            spark.sparkContext.setJobDescription(f"{name}:rep{i}")
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            if LAST_RUN_BATCHES:
                # every replay registers under its own uuid-suffixed name;
                # the newest entry is this run's
                batches = list(LAST_RUN_BATCHES.values())[-1]
        spark.sparkContext.setJobDescription(None)
        out[name] = {"sec": round(best, 2), "input_batches": batches}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
