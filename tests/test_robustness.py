"""Failure-path and dialect-edge tests (SURVEY.md §7.7): schema drift on
append, unsupported formats, inference divergence pinned by explicit schemas
(FIXTURES.md §2 EPL shape)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import types as T

from data_engineering_zoomcamp_my_test_spark.sinks import save_table
from data_engineering_zoomcamp_my_test_spark.sources import read_csv, read_source


EPL_SCHEMA = T.StructType(
    [
        T.StructField("Div", T.StringType()),
        T.StructField("Date", T.StringType()),  # dd/MM/yyyy stays string (§7.7.6)
        T.StructField("HomeTeam", T.StringType()),
        T.StructField("AwayTeam", T.StringType()),
        T.StructField("FTHG", T.LongType()),
        T.StructField("FTAG", T.LongType()),
        T.StructField("FTR", T.StringType()),
        T.StructField("B365H", T.DoubleType()),
    ]
)

EPL_CSV = (
    "Div,Date,HomeTeam,AwayTeam,FTHG,FTAG,FTR,B365H\n"
    "E0,10/08/2018,Man United,Leicester,2,1,H,1.57\n"
    "E0,11/08/2018,Bournemouth,Cardiff,2,0,H,1.90\n"
)


def test_epl_ingest_explicit_schema(spark, tmp_path):
    """Reference CSV-ingest shape with the pinned schema: Date must remain a
    string (pandas and Spark infer dd/MM/yyyy differently — §7.7.6)."""
    p = tmp_path / "season-1819.csv"
    p.write_text(EPL_CSV)
    df = read_csv(spark, str(p), schema=EPL_SCHEMA)
    assert dict(df.dtypes) == {
        "Div": "string", "Date": "string", "HomeTeam": "string",
        "AwayTeam": "string", "FTHG": "bigint", "FTAG": "bigint",
        "FTR": "string", "B365H": "double",
    }
    rows = df.collect()
    assert rows[0].Date == "10/08/2018" and rows[0].FTHG == 2


def test_append_schema_drift_rejected(spark):
    """Appending a frame with a different schema must fail loudly, not
    corrupt the table."""
    base = spark.createDataFrame([Row(a=1, b="x")])
    drifted = spark.createDataFrame([Row(a=2, c=3.5)])
    assert save_table(base, "t_drift", if_exists="replace")
    with pytest.raises(Exception):
        save_table(drifted, "t_drift", if_exists="append")
    # table unchanged
    assert spark.table("t_drift").columns == ["a", "b"]
    assert spark.table("t_drift").count() == 1
    spark.sql("DROP TABLE t_drift")


def test_unsupported_format_rejected(spark, tmp_path):
    p = tmp_path / "data.xyz"
    p.write_text("junk")
    with pytest.raises(ValueError, match="unsupported source format"):
        read_source(spark, str(p))


def test_corrupt_parquet_fails_loudly(spark, tmp_path):
    p = tmp_path / "bad.parquet"
    p.write_bytes(b"this is not parquet at all")
    with pytest.raises(Exception):
        spark.read.parquet(str(p)).collect()
