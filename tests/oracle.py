"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL on the same parquet tables and
compares row count, column names, and an order-insensitive value comparison
(sorted rows over name-sorted columns, with float tolerance surfaced as exact
repr equality by default — the driver hashes, so we default to exact).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

from data_engineering_zoomcamp_my_test_spark.sources.tables import TABLE_NAMES


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_spark: int
    row_count_oracle: int
    mismatches: list[str] = field(default_factory=list)

    def __bool__(self) -> bool:
        return self.ok


def _duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        # Partial-decade dirs (e.g. the sf100 subset) only carry the tables
        # their queries read; skip absent ones instead of failing to connect.
        if not os.path.exists(path):
            continue
        # Spark-written tables are directories of part files; DuckDB needs
        # the glob form for those (driver testdata is single-file).
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(name: str, spark_df, oracle_query: str, sf_dir: str) -> CompareResult:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    con = _duckdb_con(sf_dir)
    rel = con.sql(oracle_query)
    oracle_cols = list(rel.columns)
    oracle_rows = rel.fetchall()
    con.close()

    mism: list[str] = []
    if sorted(spark_cols) != sorted(oracle_cols):
        mism.append(f"columns: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
    if len(spark_rows) != len(oracle_rows):
        mism.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    if not mism:
        s = _sorted_rows(spark_cols, spark_rows)
        o = _sorted_rows(oracle_cols, oracle_rows)
        for i, (a, b) in enumerate(zip(s, o)):
            if a != b:
                mism.append(f"row {i}: spark={a!r} oracle={b!r}")
                if len(mism) >= 6:
                    break
    return CompareResult(
        name=name,
        ok=not mism,
        row_count_spark=len(spark_rows),
        row_count_oracle=len(oracle_rows),
        mismatches=mism,
    )
