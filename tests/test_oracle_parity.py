"""Differential tests: every declared query vs its DuckDB oracle (the local
mimic of the driver's t2 gate). Runs at sf0.001 for speed; set
SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 to run the driver-scale check."""

from __future__ import annotations

import os

import pytest

from data_engineering_zoomcamp_my_test_spark.operators import (
    all_oracle_sql,
    all_queries,
)

from .oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

_QUERIES = all_queries()
_ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, name):
    res = compare(name, _QUERIES[name](spark, SF_DIR), _ORACLE[name], SF_DIR)
    assert res.ok, f"{name}: {res.mismatches}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
