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
