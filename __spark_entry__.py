"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shape aggregate) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full declared-operator
catalog (SURVEY.md §2) — implementations live in
``data_engineering_zoomcamp_my_test_spark/operators/``; keys without an
oracle entry are approximate/custom-hash operators that get the driver's
rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_zoomcamp_my_test_spark.operators import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)
from data_engineering_zoomcamp_my_test_spark.session import (  # noqa: E402
    ensure_session_conf,
)

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_conf(spark)
    return all_queries()["b3_groupby_agg"](spark, _SF0001)


def _wrap(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_session_conf(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    return all_oracle_sql()
