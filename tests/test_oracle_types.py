"""Guard: no oracle may produce a column type Spark cannot mirror.

DuckDB widens SUM(BIGINT) to HUGEINT (int128). Spark has no int128, so the
driver's type-sensitive hash mismatches even when every value is identical —
this bit c5_text_stats / c9_session / c21_json_agg in round 2 (VERDICT.md
"What's wrong" #1-3). Every such sum must be wrapped CAST(... AS BIGINT) in
the oracle SQL. This test plans every declared oracle against DuckDB and
asserts none of the Spark-unrepresentable types appear in the result schema,
so the trap cannot regress silently.
"""

from __future__ import annotations

import duckdb
import pytest

from data_engineering_zoomcamp_my_test_spark.operators import all_oracle_sql
from data_engineering_zoomcamp_my_test_spark.sources.tables import TABLE_NAMES
from tests.oracle import comparator_unsafe_type

SF_DIR = "/root/testdata/sf0.001"

# Types DuckDB can emit that have no Spark SQL equivalent (or whose closest
# Spark type would hash differently in the driver's Arrow-level compare).
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}

_ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_schema_has_no_spark_unrepresentable_type(con, name):
    rel = con.sql(_ORACLE[name])
    bad = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, rel.types)
        if str(typ).upper() in _FORBIDDEN
    ]
    assert not bad, (
        f"{name} oracle emits Spark-unrepresentable column(s) {bad}; "
        f"wrap the offending aggregate in CAST(... AS BIGINT) in the oracle SQL"
    )


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_schema_is_comparator_safe(con, name):
    """The driver's _canon crashes on array-typed cells (r8: c38/c39 `err`,
    TypeError unhashable numpy.ndarray inside its pandas sort). Any decl
    with an oracle can be driver-seated, so its projection must be scalar
    columns only — explode arrays (posexplode + zipped DuckDB unnest, the
    c38/c39 pattern) or emit a per-vector digest. Library functions may
    still return arrays; this guards the DECLARED projection."""
    rel = con.sql(_ORACLE[name])
    bad = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, rel.types)
        if comparator_unsafe_type(str(typ))
    ]
    assert not bad, (
        f"{name} oracle declares comparator-unsafe column(s) {bad}; the "
        f"driver comparator cannot canonicalize nested cells — explode to "
        f"scalar rows or digest (see c38_l2_normalize)"
    )
