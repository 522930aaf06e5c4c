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


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    if_exists: str = "replace",
    properties: dict[str, str] | None = None,
) -> bool:
    """Network-database sink — the reference's one TCP boundary (it pushed
    frames into Postgres via SQLAlchemy ``to_sql``, reference
    week_1/data_ingest/data_ingest.py:97-99). ``df.write.jdbc`` opens one
    connection per partition, so rows stream from the executors in
    parallel — no driver materialization; partition count is the
    concurrency knob (the reference's chunked ``to_sql`` loop becomes
    partition sizing). Same ``if_exists`` contract as ``save_table``."""
    mode = _MODE_MAP[if_exists]
    try:
        df.write.mode(mode).jdbc(url, table, properties=properties or {})
        return True
    except AnalysisException as exc:
        if mode == "errorifexists":
            logger.warning(
                "jdbc table %s exists; skipping (if_exists=fail): %s", table, exc
            )
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


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (zlib default) — interchange format for Hive/Trino-side
    consumers; same distributed write path as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


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


def recover_table_swap(spark: SparkSession, table: str) -> bool:
    """Recover from a swap interrupted between the two renames: if the base
    name is missing but a ``__old`` (pre-swap) or ``__staging`` (new,
    complete) generation survives, reinstate one — old wins (the swap had
    not committed). Returns True if a recovery happened. Callers that
    create-if-absent MUST call this before concluding a table is missing,
    or they will shadow the surviving generation."""
    if spark.catalog.tableExists(table):
        return False
    staging, old = f"{table}__staging", f"{table}__old"
    for source in (old, staging):
        if spark.catalog.tableExists(source):
            spark.sql(f"ALTER TABLE {source} RENAME TO {table}")
            return True
    return False


def _staged_table_swap(spark: SparkSession, table: str, merged: DataFrame) -> None:
    """Crash-safe replacement of a managed table's contents: the merged
    result is made durable in a staging table FIRST, then swapped in with
    metastore renames, and the old generation is dropped LAST. A crash at
    any step leaves a surviving generation (base, ``__old``, or
    ``__staging``) — never zero copies, unlike a read + in-place
    ``overwrite`` (which drops the base before rewriting it). Leftovers are
    only dropped while the base table exists; if a previous swap died
    between its renames, ``recover_table_swap`` reinstates the survivor
    first instead of deleting it."""
    recover_table_swap(spark, table)
    staging, old = f"{table}__staging", f"{table}__old"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    merged.write.mode("errorifexists").saveAsTable(staging)
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    spark.sql(f"DROP TABLE {old}")


def upsert_table(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key: str,
) -> None:
    """MERGE-style upsert without a transactional table format: new rows
    replace base rows with the same key; unmatched base rows survive.
    Emulated as ``updates UNION ALL (base ANTI-JOIN update-keys)`` — the
    classic CDC merge shape Spark runs when Delta/Iceberg jars aren't
    available (their MERGE INTO compiles to this same join under the hood).
    Durability: staged-write + rename swap (``_staged_table_swap``), so the
    base table is never the only copy mid-operation. At 100 TB the base is
    bucketed on the key so the anti-join is shuffle-free on the big side."""
    # a previous swap may have died between its renames: reinstate the
    # surviving generation BEFORE dereferencing the base table
    recover_table_swap(spark, table)
    base = spark.table(table)
    keys = updates.select(key).distinct()
    survivors = base.join(keys, key, "left_anti")
    merged = updates.select(*base.columns).unionAll(survivors)
    _staged_table_swap(spark, table, merged)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any supported scheme — local, HDFS, or an
    object store with its connector on the classpath. File sizing and
    renames must go through this API, not ``pathlib``, to work off-box."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~target-sized files (the steady-state housekeeping job every
    file-dropped dataset needs — streaming sinks and incremental ingests
    accumulate small files that degrade scan planning). Returns the new
    file count.

    Crash safety, delete-last: the rewrite lands in a *sibling* staging
    directory on the same filesystem (no cross-FS move, which would degrade
    to a non-atomic copy), the current generation is renamed aside, staging
    renamed in, and the old generation deleted only at the very end. A
    crash at any point leaves at least one complete copy of the data.
    Sizing and renames use the Hadoop FileSystem API so the operator works
    against object stores, not just a local disk."""
    fs, target = _hadoop_fs(spark, path)
    jvm = spark._jvm
    staging = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compacting")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__precompact")
    # Re-entry after a crash, state-aware: if the dataset is MISSING from
    # its path, a leftover IS the surviving copy — reinstate it (pre-swap
    # generation wins; the swap had not committed), never delete it.
    # Leftovers are only garbage once the dataset exists at its path.
    if not fs.exists(target):
        if fs.exists(old):
            if not fs.rename(old, target):
                raise IOError(
                    f"compact_parquet: could not reinstate {old} to {path}; "
                    "refusing to continue (it is the surviving copy)"
                )
        elif fs.exists(staging):
            if not fs.rename(staging, target):
                raise IOError(
                    f"compact_parquet: could not reinstate {staging} to {path}; "
                    "refusing to continue (it is the surviving copy)"
                )
        else:
            raise IOError(f"compact_parquet: no dataset at {path}")
    for leftover in (staging, old):
        if fs.exists(leftover):
            fs.delete(leftover, True)

    total_bytes = fs.getContentSummary(target).getLength()
    n_files = max(1, round(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("errorifexists").parquet(str(staging))
    if not fs.rename(target, old):
        raise IOError(f"compact_parquet: could not rename {path} aside")
    if not fs.rename(staging, target):
        # roll back so the dataset stays readable at its original path
        fs.rename(old, target)
        raise IOError(f"compact_parquet: could not swap staging into {path}")
    fs.delete(old, True)
    return n_files


def scd2_apply(
    spark: SparkSession,
    history_table: str,
    updates: DataFrame,
    key: str,
    batch_ts: str,
) -> None:
    """Slowly-changing-dimension type 2: keep full history with
    valid_from/valid_to/is_current columns. Updated keys close their
    current row (valid_to = batch_ts) and append a new current row.
    Emulated without a transactional format the same way MERGE is
    (see ``upsert_table``): one anti/semi join pass + union, landed via
    staged-write + rename swap (``_staged_table_swap``)."""
    recover_table_swap(spark, history_table)
    base = spark.table(history_table)
    data_cols = [c for c in updates.columns]
    keys = updates.select(key).distinct()

    from pyspark.sql import functions as F

    untouched = base.join(keys, key, "left_anti")
    closed = (
        base.join(keys, key, "left_semi")
        .filter(F.col("is_current"))
        .withColumn("valid_to", F.lit(batch_ts))
        .withColumn("is_current", F.lit(False))
    )
    still_history = base.join(keys, key, "left_semi").filter(~F.col("is_current"))
    fresh = (
        updates.withColumn("valid_from", F.lit(batch_ts))
        .withColumn("valid_to", F.lit(None).cast("string"))
        .withColumn("is_current", F.lit(True))
        .select(*data_cols, "valid_from", "valid_to", "is_current")
    )
    merged = untouched.unionByName(closed).unionByName(still_history).unionByName(fresh)
    _staged_table_swap(spark, history_table, merged)


def scd2_init(
    spark: SparkSession, history_table: str, initial: DataFrame, batch_ts: str
) -> None:
    """Create an SCD2 history table from an initial snapshot."""
    from pyspark.sql import functions as F

    df = (
        initial.withColumn("valid_from", F.lit(batch_ts))
        .withColumn("valid_to", F.lit(None).cast("string"))
        .withColumn("is_current", F.lit(True))
    )
    df.write.mode("overwrite").saveAsTable(history_table)


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


def cdc_snapshot(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
    validate_unique_seq: bool = False,
) -> DataFrame:
    """Changelog compaction: reduce an insert/update/delete event log to
    the current snapshot — the read side of CDC ingestion (what MERGE
    applies incrementally, computed from scratch). Latest operation per key
    by (seq, op) wins; a winning delete erases the key. One shuffle keyed
    on the business key via max_by — no window sort.

    **Tie contract:** ``seq_col`` is assumed unique per key (a changelog
    position). If two ops do share a seq, the tie breaks by lexicographic
    op code — ``'U' > 'I' > 'D'`` — so an update/insert beats a delete at
    the same seq and the key SURVIVES. This is a stated contract, not an
    accident: a well-formed changelog never collides, and when one does the
    non-destructive outcome is the recoverable one. Callers that would
    rather fail than guess pass ``validate_unique_seq=True``: the plan then
    raises at execution time on any key with a duplicated seq (checked
    distributed, inside the same single shuffle — no extra pass).
    """
    from pyspark.sql import functions as F

    others = [c for c in changes.columns if c not in (key, seq_col, op_col)]
    if "_op" in others:
        raise ValueError(
            "cdc_snapshot: changelog has a data column named '_op', which "
            "collides with the internal op alias; rename it"
        )
    aggs = [
        F.max_by(
            F.struct(F.col(op_col).alias("_op"), *[F.col(c) for c in others]),
            F.struct(F.col(seq_col), F.col(op_col)),
        ).alias("_last")
    ]
    if validate_unique_seq:
        aggs += [
            F.count(F.lit(1)).alias("_n"),
            F.count_distinct(F.col(seq_col)).alias("_n_seq"),
        ]
    latest = changes.groupBy(key).agg(*aggs)
    op = F.col("_last._op")
    if validate_unique_seq:
        op = F.when(
            F.col("_n") != F.col("_n_seq"),
            F.raise_error(
                F.concat(
                    F.lit("cdc_snapshot: duplicate seq for key "),
                    F.col(key).cast("string"),
                )
            ).cast("string"),
        ).otherwise(op)
    return (
        latest.filter(op != "D")
        .select(key, *[F.col(f"_last.{c}").alias(c) for c in others])
    )


def land_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Sort-on-write data layout: range-partition on the filter columns,
    sort within each file, write parquet. Every parquet row group then
    covers a narrow [min, max] band of the sort key, so the reader's
    pushed filters prune row groups (and whole files) instead of
    scanning everything — the poor man's clustering index, and the
    single cheapest data-skipping lever at 100 TB (a time-or-key-bounded
    query reads only its band; effect is metric-asserted in
    tests/test_scale_posture.py). ``n_files`` bounds the file count for
    small relands; default leaves the range partitioner's choice."""
    parts = df.repartitionByRange(*sort_cols) if n_files is None else (
        df.repartitionByRange(n_files, *sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
