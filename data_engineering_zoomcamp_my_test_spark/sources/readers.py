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
