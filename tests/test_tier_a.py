"""E2E tests for the Tier-A surface (SURVEY.md §2.1): ingest -> store ->
SQL passthrough -> transform -> publish, including the write-mode matrix and
format round-trips."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_zoomcamp_my_test_spark.operators.transforms import (
    project_first_k,
    with_literal_column,
)
from data_engineering_zoomcamp_my_test_spark.plans import (
    create_database_if_absent,
    preview,
    run_sql,
    table_exists,
)
from data_engineering_zoomcamp_my_test_spark.sinks import (
    publish_to_object_store,
    save_table,
    write_csv,
    write_parquet,
    write_warehouse_table,
)
from data_engineering_zoomcamp_my_test_spark.sources import read_source


@pytest.fixture()
def csv_fixture(tmp_path):
    p = tmp_path / "football.csv"
    p.write_text(
        "Div,Date,HomeTeam,AwayTeam,FTHG,FTAG,FTR\n"
        "E0,10/08/2018,Man United,Leicester,2,1,H\n"
        "E0,11/08/2018,Bournemouth,Cardiff,2,0,H\n"
        "E0,11/08/2018,Fulham,Crystal Palace,0,2,A\n"
    )
    return str(p)


def test_read_source_csv(spark, csv_fixture):
    df = read_source(spark, csv_fixture)
    assert df.count() == 3
    assert df.columns[:4] == ["Div", "Date", "HomeTeam", "AwayTeam"]
    # pandas-style dtype inference: goals become ints
    assert dict(df.dtypes)["FTHG"] == "int"


def test_read_source_local_short_circuit(spark, sf_small):
    df = read_source(spark, os.path.join(sf_small, "region.parquet"))
    assert df.count() == 5


def test_read_source_file_uri(spark, csv_fixture):
    df = read_source(spark, f"file://{csv_fixture}")
    assert df.count() == 3


def test_save_table_mode_matrix(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    create_database_if_absent(spark, "t_a")
    t = "t_a.mode_matrix"

    assert save_table(df, t, if_exists="replace") is True
    assert table_exists(spark, t)
    assert spark.table(t).count() == 2

    assert save_table(df, t, if_exists="append") is True
    assert spark.table(t).count() == 4

    # 'fail' on existing: reference logged and continued (data_ingest.py:101)
    assert save_table(df, t, if_exists="fail") is False
    assert spark.table(t).count() == 4

    assert save_table(df, t, if_exists="replace") is True
    assert spark.table(t).count() == 2
    spark.sql(f"DROP TABLE {t}")


def test_sql_passthrough_and_preview(spark, sf_small):
    out = run_sql(
        spark,
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY n DESC",
        sf_dir=sf_small,
    )
    rows = out.collect()
    assert sum(r.n for r in rows) == 1500
    text = preview(out, 3)
    assert "o_orderpriority" in text


def test_transforms(spark, sf_small):
    df = run_sql(spark, "SELECT * FROM lineitem", sf_dir=sf_small)
    assert project_first_k(df, 10).columns == df.columns[:10]
    lit_df = with_literal_column(df, "transformation", "tagged")
    assert lit_df.select("transformation").distinct().collect()[0][0] == "tagged"


def test_parquet_gzip_roundtrip(spark, sf_small, tmp_path):
    src = spark.read.parquet(os.path.join(sf_small, "nation.parquet"))
    out = str(tmp_path / "nation_gz")
    write_parquet(src, out, compression="gzip")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files and all(".gz." in f for f in files)
    back = spark.read.parquet(out)
    assert sorted(back.collect()) == sorted(src.collect())


def test_csv_roundtrip(spark, sf_small, tmp_path):
    src = spark.read.parquet(os.path.join(sf_small, "region.parquet"))
    out = str(tmp_path / "region_csv")
    write_csv(src, out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert sorted(back.collect()) == sorted(src.collect())


def test_object_store_publish(spark, sf_small, tmp_path):
    """A14/A15: 'object store' = a second filesystem root in tests."""
    src = spark.read.parquet(os.path.join(sf_small, "supplier.parquet"))
    uri = str(tmp_path / "bucket" / "supplier")
    publish_to_object_store(src, uri)
    assert spark.read.parquet(uri).count() == src.count()


def test_warehouse_write_df_and_uri(spark, sf_small, tmp_path):
    src = spark.read.parquet(os.path.join(sf_small, "region.parquet"))
    assert write_warehouse_table(spark, src, "region_copy") is True
    assert spark.table("warehouse.region_copy").count() == 5

    # server-side-load semantics: URI -> table, no df materialization
    uri = os.path.join(sf_small, "nation.parquet")
    assert write_warehouse_table(spark, uri, "nation_copy") is True
    assert spark.table("warehouse.nation_copy").count() == 25
    spark.sql("DROP TABLE warehouse.region_copy")
    spark.sql("DROP TABLE warehouse.nation_copy")


def test_upsert_table_merge_semantics(spark):
    from data_engineering_zoomcamp_my_test_spark.sinks import upsert_table

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, x double"
    )
    save_table(base, "t_upsert", if_exists="replace")
    updates = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id long, v string, x double"
    )
    upsert_table(spark, "t_upsert", updates, "id")
    got = {r.id: (r.v, r.x) for r in spark.table("t_upsert").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 200.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent: re-applying the same updates changes nothing
    upsert_table(spark, "t_upsert", updates, "id")
    assert {r.id: (r.v, r.x) for r in spark.table("t_upsert").collect()} == got
    spark.sql("DROP TABLE t_upsert")


def test_full_reference_pipeline_shape(spark, csv_fixture, tmp_path):
    """The reference's end-to-end: fetch -> store table -> user SQL ->
    first-k projection + literal col -> gzip parquet -> re-read."""
    df = read_source(spark, csv_fixture)
    save_table(df, "football", if_exists="replace")
    q = run_sql(spark, "SELECT * FROM football WHERE FTR = 'H'")
    t = with_literal_column(project_first_k(q, 5))
    out = str(tmp_path / "football_out")
    write_parquet(t, out)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert back.columns == ["Div", "Date", "HomeTeam", "AwayTeam", "FTHG", "transformation"]
    spark.sql("DROP TABLE football")


def test_orc_roundtrip_with_pushdown(spark, sf_small, tmp_path):
    """ORC write -> read_source dispatch -> filter pushdown reaches the ORC
    scan, rows round-trip exactly."""
    from data_engineering_zoomcamp_my_test_spark.plans.sql import explain_str
    from data_engineering_zoomcamp_my_test_spark.sinks import write_orc
    from data_engineering_zoomcamp_my_test_spark.sources import read_source

    src = spark.read.parquet(f"{sf_small}/nation.parquet")
    out = str(tmp_path / "nation.orc")
    write_orc(src, out)
    back = read_source(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = explain_str(back.filter("n_regionkey = 1"), "formatted")
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1].split("\n")[0]


def test_jdbc_write_read_roundtrip_and_partitioned_scan(spark):
    """A7's fetch-to-DataFrame arm (reference pulled query results out of
    Postgres into a frame): write over JDBC to embedded Derby, read back
    via read_jdbc — both the table scan and the query= arm — and check a
    partitioned read splits into the requested number of range slices."""
    from data_engineering_zoomcamp_my_test_spark.sinks import write_jdbc
    from data_engineering_zoomcamp_my_test_spark.sources import read_jdbc

    url = "jdbc:derby:memory:readtest;create=true"
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 101)], "id long, v string"
    )
    try:
        assert write_jdbc(df, url, "t_src", if_exists="replace")
    except Exception as exc:  # pragma: no cover - env-dependent
        if "ClassNotFound" in str(exc) or "No suitable driver" in str(exc):
            pytest.skip(f"no embedded JDBC driver: {exc}")
        raise

    back = read_jdbc(spark, url, table="t_src")
    assert back.count() == 100
    assert sorted(c.lower() for c in back.columns) == ["id", "v"]

    # Spark's JDBC writer quotes identifiers, so Derby stores the column as
    # case-sensitive "id" — raw SQL must quote it too.
    q = read_jdbc(spark, url, query='SELECT "id" FROM t_src WHERE "id" <= 10')
    assert sorted(r[0] for r in q.collect()) == list(range(1, 11))

    part = read_jdbc(
        spark, url, table="t_src",
        partition_column='"id"', lower_bound=1, upper_bound=101, num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 100

    with pytest.raises(ValueError):
        read_jdbc(spark, url)  # neither table nor query
    with pytest.raises(ValueError):
        read_jdbc(spark, url, table="t_src", query="SELECT 1")  # both
    with pytest.raises(ValueError):
        read_jdbc(spark, url, table="t_src", partition_column="id")  # no bounds
