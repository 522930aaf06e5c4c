"""SQL passthrough + plan inspection.

The reference's whole query surface was "forward the user's SQL string to the
database" (reference week_1/data_ingest/data_ingest.py:106-132). Natively that
is ``spark.sql`` over registered views: Catalyst does parse -> analyze ->
optimize -> physical plan -> whole-stage codegen. ``run_sql`` optionally
registers the standard tables first so any user SQL over them just works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_tables


def run_sql(
    spark: SparkSession, sql_query: str, sf_dir: str | None = None
) -> DataFrame:
    """Execute an arbitrary SQL string (A7). If ``sf_dir`` is given, the
    standard tables are (re)registered as temp views first."""
    if sf_dir is not None:
        register_tables(spark, sf_dir)
    return spark.sql(sql_query)


def preview(df: DataFrame, n: int = 20) -> str:
    """Row preview (A18) — returns the rendered table instead of printing."""
    return df._show_string(n, 0, False)  # noqa: SLF001 - stable internal


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string — used by tests to assert pushdown,
    broadcast choice, and whole-stage codegen coverage."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )
