"""Skew-handling primitives for hot keys (the 100 TB posture, SURVEY.md
§2.3 scale rule).

AQE's skew-join splitting handles most cases automatically (enabled in
session.py); these are the explicit tools for the cases AQE can't see:

- ``salted_aggregate``: two-phase aggregation — pre-aggregate on
  (key, salt) so one hot key spreads over N reducers, then merge. Correct
  for any algebraic aggregate (sum/count/min/max); exposed here for
  count+decimal-sum.
- ``salted_join``: replicate the small side N ways, salt the skewed fact
  side — every hot-key row lands on a different reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — used on the skewed side."""
    return df.withColumn(
        col_name, (F.rand(seed=42) * n_salts).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase count+sum per key. Phase 1 shuffles on (key, salt) —
    bounded fan-in per reducer even if one key is 90% of the data; phase 2
    merges the per-salt partials (tiny)."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(agg_col).alias("_s"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").cast("double").alias("total"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi join: salt the fact side, explode the dim side across
    all salt values, join on (key, salt). Dim grows n_salts x — use only
    when dim is small and the fact key distribution is pathological."""
    salted_fact = with_salt(fact, n_salts)
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (F.col(f"l.{fact_key}") == F.col(f"r.{dim_key}")) & (
        F.col("l._salt") == F.col("r._salt")
    )
    return (
        salted_fact.alias("l")
        .join(exploded_dim.alias("r"), cond)
        .drop("_salt")
    )
