"""File / URL sources.

Reproduces the reference's extract surface (SURVEY.md §2 A1-A3, A15):

- Parquet scan (reference week_1/data_ingest/data_ingest.py:30-33)
- CSV scan with inferred types (data_ingest.py:57-58)
- HTTP fetch-then-scan with local-path short-circuit and re-download
  overwrite (data_ingest.py:36-50)

Spark-first notes: parquet/CSV go straight to ``spark.read`` (distributed,
pushdown-capable). HTTP fetch is inherently a driver-side utility — Spark has
no HTTP file source — so the fetch lands the bytes on a local/shared path and
the distributed scan starts from there, same as the reference's wget step.
"""

from __future__ import annotations

import os
import shutil
import urllib.request
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; schema from the file footer (A1)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV scan (A2). Pass an explicit ``schema`` in production paths —
    inference costs an extra pass and is nondeterministic across engines."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (both formats are first-class in Spark's vectorized reader)."""
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Network-database SOURCE — the symmetric read arm of
    ``sinks.write_jdbc`` (the reference fetched query results from
    Postgres into a frame, reference week_1/data_ingest/data_ingest.py:
    130-132; here that fetch lands as a distributed scan, not a driver
    cursor). Exactly one of ``table`` / ``query`` must be given: ``table``
    scans a relation (Spark pushes filters/projections into the remote SQL),
    ``query`` wraps arbitrary SQL as the source relation.

    Scale posture: a bare JDBC read is ONE connection on one executor —
    fine for dimension-sized pulls, wrong for a big fact table. Pass
    ``partition_column``/``lower_bound``/``upper_bound``/``num_partitions``
    to split the scan into range-predicate slices fetched concurrently by
    the executors (the JDBC analogue of parquet split planning)."""
    if (table is None) == (query is None):
        raise ValueError("read_jdbc: pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if partition_column is not None:
        if table is None:
            raise ValueError(
                "read_jdbc: partitioned reads require table= (Spark cannot "
                "range-split an arbitrary query= relation)"
            )
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound, "
                "upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def fetch_to_local(url: str, dest_dir: str = "/tmp/spark_graft_fetch") -> str:
    """Download ``url`` to a local file and return the path (A3 semantics).

    - Local-path short-circuit: if ``url`` is an existing path (or file://),
      return it untouched (reference data_ingest.py:36-38).
    - Overwrite-if-stale: an existing previous download is replaced
      (reference data_ingest.py:44-47).
    """
    if os.path.exists(url):
        return url
    parsed = urlparse(url)
    if parsed.scheme in ("", "file"):
        return parsed.path or url
    os.makedirs(dest_dir, exist_ok=True)
    fname = os.path.basename(parsed.path) or "download"
    dest = os.path.join(dest_dir, fname)
    if os.path.exists(dest):
        os.remove(dest)
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as out:
        shutil.copyfileobj(resp, out)
    return dest


def read_source(
    spark: SparkSession,
    url_or_path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Fetch (if remote) then scan, dispatching on extension — the
    reference's ``get_data`` (data_ingest.py:21-63): parquet via A1, csv via
    A2 (gz accepted, Spark decompresses transparently)."""
    path = fetch_to_local(url_or_path)
    lower = path.lower()
    if lower.endswith((".parquet", ".pq")):
        return read_parquet(spark, path)
    if lower.endswith((".csv", ".csv.gz")):
        return read_csv(spark, path, schema=schema)
    if lower.endswith((".json", ".json.gz", ".jsonl", ".ndjson")):
        return read_json(spark, path, schema=schema)
    if lower.endswith(".orc"):
        return read_orc(spark, path)
    raise ValueError(f"unsupported source format: {path}")
