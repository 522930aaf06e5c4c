"""Tier-A in-flight transforms + default queries (SURVEY.md §2.1).

These reproduce the reference's explicitly coded pipeline operators:
- default COUNT(*) query (reference week_1/data_ingest/data_ingest.py:18-19)
- default LIMIT-100 preview (week_2/data_ingest/data_ingest.py:25-26),
  made deterministic with an ORDER BY key (Spark has no insertion order)
- positional first-k projection (week_2/data_ingest/data_ingest.py:174)
- literal column append (week_2/data_ingest/data_ingest.py:175)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

TRANSFORMATION_TAG = "spark_engine_transformed"


def project_first_k(df: DataFrame, k: int) -> DataFrame:
    """Positional projection — keep the first ``k`` columns (A10)."""
    return df.select(*df.columns[:k])


def with_literal_column(
    df: DataFrame, name: str = "transformation", value: str = TRANSFORMATION_TAG
) -> DataFrame:
    """Append a constant string column (A11)."""
    return df.withColumn(name, F.lit(value))


def _a8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def _a9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders").orderBy("o_orderkey").limit(100)
    )


def _a10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return project_first_k(load_table(spark, sf_dir, "lineitem"), 10)


def _a11(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return with_literal_column(df)


QUERIES = {
    "a8_count_star": _a8,
    "a9_limit": _a9,
    "a10_project_first10": _a10,
    "a11_lit_col": _a11,
}

ORACLE = {
    "a8_count_star": "SELECT COUNT(*) AS n_rows FROM lineitem",
    "a9_limit": "SELECT * FROM orders ORDER BY o_orderkey LIMIT 100",
    "a10_project_first10": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus "
        "FROM lineitem"
    ),
    "a11_lit_col": (
        "SELECT o_orderkey, o_orderstatus, o_totalprice, "
        f"'{TRANSFORMATION_TAG}' AS transformation FROM orders"
    ),
}
