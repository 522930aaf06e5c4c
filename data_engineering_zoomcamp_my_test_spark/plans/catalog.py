"""Catalog management (SURVEY.md §2 A5, A6, B29).

The reference checked/created the target database and inspected table
existence before writing (reference week_1/data_ingest/data_ingest.py:84-95);
here the catalog is Spark's."""

from __future__ import annotations

from pyspark.sql import SparkSession


def create_database_if_absent(spark: SparkSession, db: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """Collect table (and optionally column) statistics for the cost-based
    optimizer — the engine-bootstrap step that makes CBO join reordering
    effective on managed tables (SURVEY.md §4: enable CBO + ANALYZE)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, table: str) -> str:
    """The optimizer-visible statistics line for a table."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    for r in rows:
        if r.col_name == "Statistics":
            return r.data_type
    return ""
