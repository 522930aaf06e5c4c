"""Sinks: managed tables with write modes, gzip parquet, CSV, object store,
warehouse (SURVEY.md §2 A4, A12-A17).

Write-mode semantics follow the reference's ``if_exists`` contract
(reference week_1/data_ingest/data_ingest.py:65-103):

- ``replace``  -> Spark ``overwrite``
- ``append``   -> ``append``
- ``fail``     -> ``errorifexists``; on conflict the reference logged and
  continued (data_ingest.py:101-103) — ``save_table`` reproduces that
  observable behavior (returns False instead of raising).

Scale posture: all writers are straight ``df.write`` (distributed, one task
per partition). ``partition_by`` / ``bucket_by`` expose the layout controls
that matter at 100 TB (partition pruning for consumers, shuffle-free joins on
bucketed keys). The reference's warehouse ``chunksize=500_000``
(etl_gcs_to_gbq.py:65) becomes partition sizing, not an API knob.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

logger = logging.getLogger(__name__)

_MODE_MAP = {
    "replace": "overwrite",
    "append": "append",
    "fail": "errorifexists",
    # Spark-native spellings pass through
    "overwrite": "overwrite",
    "errorifexists": "errorifexists",
    "ignore": "ignore",
}


def save_table(
    df: DataFrame,
    name: str,
    if_exists: str = "replace",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> bool:
    """Land ``df`` as a managed table (A4). Returns True if written, False
    if ``if_exists='fail'`` hit an existing table (logged, not raised)."""
    mode = _MODE_MAP[if_exists]
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols)
    try:
        writer.saveAsTable(name)
        return True
    except AnalysisException as exc:
        if mode == "errorifexists":
            logger.warning("table %s exists; skipping (if_exists=fail): %s", name, exc)
            return False
        raise


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """Gzip-parquet file sink (A12; reference used
    pq.write_table(compression='gzip'), week_2/data_ingest/data_ingest.py:280)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (A13)."""
    df.write.mode(mode).option("header", True).csv(path)


def publish_to_object_store(df: DataFrame, uri: str, fmt: str = "parquet") -> None:
    """Object-store publish (A14/A15). With a cloud connector on the
    classpath this is the same write against a ``gs://``/``s3a://`` URI; in
    tests the URI is a second local filesystem root. No local staging — the
    executors stream partitions directly to the store."""
    if fmt == "parquet":
        write_parquet(df, uri)
    elif fmt == "csv":
        write_csv(df, uri)
    else:
        raise ValueError(f"unsupported object-store format: {fmt}")


def upsert_table(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key: str,
) -> None:
    """MERGE-style upsert without a transactional table format: new rows
    replace base rows with the same key; unmatched base rows survive.
    Emulated as ``updates UNION ALL (base ANTI-JOIN update-keys)`` and an
    atomic-per-table overwrite — the classic CDC merge shape Spark runs
    when Delta/Iceberg jars aren't available (their MERGE INTO compiles to
    this same join under the hood). At 100 TB the base is bucketed on the
    key so the anti-join is shuffle-free on the big side."""
    base = spark.table(table)
    keys = updates.select(key).distinct()
    survivors = base.join(keys, key, "left_anti")
    merged = updates.select(*base.columns).unionAll(survivors)
    # Overwrite requires materializing first (can't read+overwrite the same
    # table in one plan): stage to a temp view via a local checkpoint.
    merged.localCheckpoint().write.mode("overwrite").saveAsTable(table)


def write_warehouse_table(
    spark: SparkSession,
    df_or_uri: DataFrame | str,
    table: str,
    if_exists: str = "replace",
    warehouse_db: str = "warehouse",
) -> bool:
    """Warehouse sink (A16/A17): accepts either an in-flight DataFrame (the
    reference's ``df.to_gbq``) or a source URI (the reference's server-side
    ``bigquery_load_cloud_storage``, parametrized.py:352-359 — semantics:
    copy URI -> table without driver materialization)."""
    if isinstance(df_or_uri, str):
        lower = df_or_uri.lower()
        df = (
            spark.read.parquet(df_or_uri)
            if lower.endswith((".parquet", ".pq"))
            else spark.read.option("header", True).option("inferSchema", True).csv(df_or_uri)
        )
    else:
        df = df_or_uri
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {warehouse_db}")
    return save_table(df, f"{warehouse_db}.{table}", if_exists=if_exists)
