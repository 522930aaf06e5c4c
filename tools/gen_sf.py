"""Scale up the driver-generated testdata by key-shifted replication.

``/root/testdata`` ships sf0.001/0.01/0.1; the scale story (VERDICT r2 #6)
wants one bench row at sf1. This tool builds sf1 locally as 10 key-shifted
copies of sf0.1: every surrogate key (orderkey, custkey, suppkey, partkey,
doc_id, vec_id, event_id, user_id) is offset per copy so each copy is a
self-contained TPC-H-ish universe — join fan-outs, group cardinalities and
dedup structure scale the way the generator's own sf knob scales them.
Fixed-cardinality dims (region, nation) are NOT replicated.

Usage:  python tools/gen_sf.py [--copies 10] [--src /root/testdata/sf0.1]
                               [--dst testdata_sf1]
The output directory is gitignored (generated data, ~170 MB).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

# table -> columns to shift by copy_index * stride[col-family]
_SHIFT_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey", "c_nationkey"],  # nationkey NOT shifted (see below)
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key families whose stride must agree across tables
_FAMILY = {
    "c_custkey": "cust", "o_custkey": "cust",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "order", "l_orderkey": "order",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
    # nation keys keep their 0-24 range in every copy (fixed dim)
    "c_nationkey": None, "s_nationkey": None,
}
_FIXED_DIMS = ("region", "nation")


def _strides(spark: SparkSession, src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for table, cols in _SHIFT_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        for c in cols:
            fam = _FAMILY[c]
            if fam is None:
                continue
            hi = df.agg(F.max(c)).first()[0] or 0
            out[fam] = max(out.get(fam, 0), int(hi) + 1)
    return out


def _replicate(df: DataFrame, cols: list[str], strides: dict[str, int], copies: int) -> DataFrame:
    rep = df.withColumn("_copy", F.explode(F.array(*[F.lit(i) for i in range(copies)])))
    for c in cols:
        fam = _FAMILY[c]
        if fam is None:
            continue
        rep = rep.withColumn(c, F.col(c) + F.col("_copy") * F.lit(strides[fam]))
    return rep.drop("_copy")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"))
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="subset of tables to generate (default: all); fixed dims are "
        "only copied when listed or when generating everything",
    )
    args = ap.parse_args()

    from data_engineering_zoomcamp_my_test_spark.session import _default_driver_memory

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # 32 concurrent scan+explode tasks in one JVM OOM the 1g default
        # the moment the source decade is sf10-sized; use the same
        # half-RAM-clamped default as the engine session.
        .config("spark.driver.memory", _default_driver_memory())
        .appName("gen_sf")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    known = set(_FIXED_DIMS) | set(_SHIFT_COLS)
    unknown = sorted(set(args.tables or ()) - known)
    if unknown:
        raise SystemExit(
            f"gen_sf: unknown --tables {unknown}; known tables: {sorted(known)}"
        )
    os.makedirs(args.dst, exist_ok=True)
    strides = _strides(spark, args.src)
    wanted = set(args.tables) if args.tables else None
    for table in _FIXED_DIMS:
        if wanted is not None and table not in wanted:
            continue
        spark.read.parquet(f"{args.src}/{table}.parquet").write.mode("overwrite").parquet(
            f"{args.dst}/{table}.parquet"
        )
    cpus = spark.sparkContext.defaultParallelism
    for table, cols in _SHIFT_COLS.items():
        if wanted is not None and table not in wanted:
            continue
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        out = _replicate(df, cols, strides, args.copies)
        # A single-partition source flows through _replicate's unions as a
        # handful of partitions and lands as ONE parquet file with ONE row
        # group — which Spark can then only scan with ONE task, serializing
        # every downstream stage at the generated decade no matter how many
        # executors exist (found at sf100: documents/embeddings were
        # mono-row-group, so the gram/text family ran ~single-threaded
        # until its first shuffle). Snappy-parquet compresses the text
        # tables ~10x, so size-based heuristics under-provision; target the
        # session's parallelism directly.
        if out.rdd.getNumPartitions() < cpus:
            out = out.repartition(cpus)
        out.write.mode("overwrite").parquet(f"{args.dst}/{table}.parquet")
        print(f"{table}: x{args.copies}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
