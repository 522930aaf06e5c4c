"""Loaders for the engine's star-schema + LLM-pipeline tables.

Tables (TPC-H-ish star schema plus ``events``/``documents``/``embeddings``)
live as one parquet file per table under a scale-factor directory. Loading is
a plain ``spark.read.parquet`` — columnar scan, predicate pushdown and column
pruning come free from Catalyst — with one normalization: ``events.ts`` is
written as parquet TIMESTAMP(NANOS), which Spark's vectorized reader cannot
represent; we scan it as raw int64 nanos (``spark.sql.legacy.parquet
.nanosAsLong``) and convert to a microsecond timestamp (``timestamp_micros(ns
div 1000)``), matching the micro truncation every micro-precision engine
(including the DuckDB oracle) applies.

At 100 TB each "file" becomes a directory of many parquet parts (possibly
hive-partitioned); nothing here assumes single-file inputs — paths are passed
straight to the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are safely broadcastable at ANY scale: only the
# structurally fixed-cardinality dims qualify (region=5, nation=25).
# supplier/part/customer grow with scale factor — they may still broadcast
# when the size threshold + AQE decide they fit, but never via a forced
# hint that cannot be demoted.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation"})


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-local TIMESTAMP (LTZ).

    The driver's parquet carries ``isAdjustedToUTC=false`` timestamps, which
    Spark reads as TIMESTAMP_NTZ when NTZ inference is on. The engine's
    timestamp semantics are LTZ in a UTC-pinned session (same wall-clock
    values, and instant-based functions like ``unix_micros``/``window`` work
    uniformly). The session conf disables NTZ inference; this cast is the
    belt-and-braces for foreign sessions whose scans were planned before
    ``ensure_session_conf`` ran. A no-op projection when types already match.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        # Backtick-quote (with `` escaping) rather than F.col(c)/df[c]:
        # both of those re-parse the name, so a column containing ``.``
        # would resolve as a struct path and fail (regression-tested in
        # test_robustness.py with a literal dotted name).
        quoted = "`" + c.replace("`", "``") + "`"
        df = df.withColumn(c, F.col(quoted).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from ``sf_dir``. Normalizes timestamp columns.

    Applies ``ensure_session_conf`` first so the UTC-timezone invariant the
    NTZ->LTZ cast relies on cannot be bypassed by a foreign session that
    loads tables before configuring itself.
    """
    from ..session import ensure_session_conf

    ensure_session_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = spark.read.parquet(path)
        # Historical testdata wrote ts as parquet TIMESTAMP(NANOS), scanned
        # as int64 nanoseconds-since-epoch; truncate to micros. Current
        # testdata writes µs directly — guarded on the runtime dtype.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(path))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load all tables and register each as a temp view for ``spark.sql``.

    This is the catalog-registration step that makes the SQL-passthrough
    surface (reference week_1/data_ingest/data_ingest.py:106-132, which
    forwarded user SQL to PostgreSQL) work natively: after this, any SQL over
    the table names executes on Catalyst.
    """
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
