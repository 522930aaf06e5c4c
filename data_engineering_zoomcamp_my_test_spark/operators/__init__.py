"""Operator catalog.

Each operator module exposes two dicts keyed by declared-query name:

- ``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame (the Spark-native
  implementation);
- ``ORACLE``: name -> ANSI SQL string the DuckDB oracle runs on the same
  tables (omitted for non-SQL-expressible operators, which get a rows-only
  check).

``all_queries()`` / ``all_oracle_sql()`` aggregate the catalog for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics, dedup, events, relational, similarity, text, transforms


_MODULES = (transforms, relational, dedup, similarity, text, events, analytics)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate declared queries: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
