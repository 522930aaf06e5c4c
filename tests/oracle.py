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


def comparator_unsafe_type(duckdb_type: str) -> bool:
    """True if a DuckDB result-column type would crash the DRIVER's
    canonicalizer (r8: array cells -> TypeError unhashable numpy.ndarray
    inside its pandas sort). The repo's own compare() handles these fine —
    this predicate guards what may be DECLARED to the driver."""
    t = duckdb_type.upper()
    return t.endswith("[]") or t.startswith(("LIST", "MAP", "STRUCT", "UNION"))


def comparator_unsafe_fields(spark_schema) -> list[str]:
    """Spark-side twin of :func:`comparator_unsafe_type`: names of top-level
    fields whose type the driver comparator cannot canonicalize."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in spark_schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


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


def compare_digest(name: str, spark_df, oracle_query: str, sf_dir: str) -> CompareResult:
    """Order-insensitive EXACT digest comparison for decls whose full result
    is too large to collect (the compare() path is bounded by
    spark.driver.maxResultSize). Both engines reduce the result to one
    digest row — COUNT(*) plus per-column exact aggregates — entirely
    engine-side, so nothing scales with the result:

    - integral columns: SUM/MIN/MAX over DECIMAL(38,0) (overflow-proof);
    - float columns: SUM over DECIMAL(38,6) of the same IEEE values (cast
      is deterministic per value, and equality of every value implies
      equality of the decimal sums — money-derived doubles in this engine
      are already decimal-accumulated so their values are exact);
    - booleans: count of TRUE;
    - strings: SUM(LENGTH) + COUNT(DISTINCT) + an order-insensitive
      per-row MD5 hash sum — the first and second 8 hex chars of
      md5(value) parsed as 32-bit ints and summed as DECIMAL(38,0) in
      BOTH engines (MD5 of the UTF-8 bytes is engine-independent, and
      comparing the two half-sums is equivalent in strength to the
      combined 64-bit sum since sum(hi*2^32+lo) = 2^32*sum(hi)+sum(lo)).
      A multiset difference in values is invisible to this digest only
      if the 64-bit hash sums collide (~2^-64 per the standard
      fingerprinting argument) — no longer materially weaker than the
      row-level hash.

    A digest match is necessary-but-weaker evidence than the row-level
    hash; a mismatch is always a real divergence."""
    from pyspark.sql import functions as F

    aggs_s: list = [F.count(F.lit(1)).alias("n")]
    aggs_o: list[str] = ["COUNT(*) AS n"]
    for f in spark_df.schema.fields:
        c, t = f.name, f.dataType.simpleString()
        if t in ("bigint", "int", "smallint", "tinyint", "long"):
            aggs_s += [
                F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}"),
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
            ]
            aggs_o += [
                f'SUM(CAST("{c}" AS DECIMAL(38,0))) AS s_{c}',
                f'MIN("{c}") AS mn_{c}',
                f'MAX("{c}") AS mx_{c}',
            ]
        elif t in ("double", "float"):
            aggs_s.append(F.sum(F.col(c).cast("decimal(38,6)")).alias(f"s_{c}"))
            aggs_o.append(f'SUM(CAST("{c}" AS DECIMAL(38,6))) AS s_{c}')
        elif t == "boolean":
            aggs_s.append(
                F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long").alias(f"s_{c}")
            )
            aggs_o.append(
                f'CAST(SUM(CASE WHEN "{c}" THEN 1 ELSE 0 END) AS BIGINT) AS s_{c}'
            )
        elif t == "string":
            md5_s = F.md5(F.col(c).cast("binary"))
            aggs_s += [
                F.sum(F.length(c).cast("decimal(38,0)")).alias(f"l_{c}"),
                F.countDistinct(c).alias(f"d_{c}"),
                F.sum(
                    F.conv(F.substring(md5_s, 1, 8), 16, 10).cast("decimal(38,0)")
                ).alias(f"h1_{c}"),
                F.sum(
                    F.conv(F.substring(md5_s, 9, 8), 16, 10).cast("decimal(38,0)")
                ).alias(f"h2_{c}"),
            ]
            aggs_o += [
                f'SUM(CAST(LENGTH("{c}") AS DECIMAL(38,0))) AS l_{c}',
                f'COUNT(DISTINCT "{c}") AS d_{c}',
                f"SUM(CAST(CAST('0x' || substring(md5(\"{c}\"), 1, 8) AS BIGINT)"
                f" AS DECIMAL(38,0))) AS h1_{c}",
                f"SUM(CAST(CAST('0x' || substring(md5(\"{c}\"), 9, 8) AS BIGINT)"
                f" AS DECIMAL(38,0))) AS h2_{c}",
            ]
        elif t.startswith("timestamp"):
            aggs_s.append(
                F.sum(F.unix_micros(c).cast("decimal(38,0)")).alias(f"s_{c}")
            )
            aggs_o.append(f'SUM(CAST(epoch_us("{c}") AS DECIMAL(38,0))) AS s_{c}')
        else:
            raise ValueError(f"compare_digest: unsupported column type {t} ({c})")

    srow = spark_df.agg(*aggs_s).head().asDict()
    con = _duckdb_con(sf_dir)
    cols = ", ".join(aggs_o)
    orow_rel = con.sql(f"SELECT {cols} FROM ({oracle_query}) _digest_src")
    orow = dict(zip(orow_rel.columns, orow_rel.fetchone()))
    con.close()

    def _norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            return repr(v)
        return str(v)

    mism = [
        f"{k}: spark={_norm(srow.get(k))} oracle={_norm(orow.get(k))}"
        for k in srow
        if _norm(srow.get(k)) != _norm(orow.get(k))
    ]
    n = int(srow["n"])
    return CompareResult(name, not mism, n, int(orow["n"]), mism)
