"""Table-maintenance utilities: small-file compaction and SCD2 history."""

from __future__ import annotations

import os

from data_engineering_zoomcamp_my_test_spark.sinks import (
    compact_parquet,
    scd2_apply,
    scd2_init,
)


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _, files in os.walk(path):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_compaction_reduces_files_preserves_rows(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    path = str(tmp_path / "fragmented")
    src.repartition(37).write.parquet(path)  # simulate small-file buildup
    assert len(_parquet_files(path)) == 37
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    n = compact_parquet(spark, path)
    assert len(_parquet_files(path)) == n < 37
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after


def test_scd2_history_tracking(spark):
    init = spark.createDataFrame(
        [(1, "alice", "NY"), (2, "bob", "SF")], "id long, name string, city string"
    )
    scd2_init(spark, "t_scd2", init, "2024-01-01")
    try:
        # bob moves; carol appears
        updates = spark.createDataFrame(
            [(2, "bob", "LA"), (3, "carol", "TX")], "id long, name string, city string"
        )
        scd2_apply(spark, "t_scd2", updates, "id", "2024-02-01")

        rows = spark.table("t_scd2").collect()
        by = {}
        for r in rows:
            by.setdefault(r.id, []).append(r)

        # alice untouched: one current row
        assert len(by[1]) == 1 and by[1][0].is_current
        # bob: closed NY row + current LA row
        bob = sorted(by[2], key=lambda r: r.valid_from)
        assert len(bob) == 2
        assert bob[0].city == "SF" and not bob[0].is_current and bob[0].valid_to == "2024-02-01"
        assert bob[1].city == "LA" and bob[1].is_current and bob[1].valid_to is None
        # carol: new current row
        assert len(by[3]) == 1 and by[3][0].is_current

        # second batch: bob moves again -> 3 rows, one current
        scd2_apply(
            spark,
            "t_scd2",
            spark.createDataFrame([(2, "bob", "CHI")], "id long, name string, city string"),
            "id",
            "2024-03-01",
        )
        bob2 = sorted(
            (r for r in spark.table("t_scd2").collect() if r.id == 2),
            key=lambda r: r.valid_from,
        )
        assert [r.city for r in bob2] == ["SF", "LA", "CHI"]
        assert [r.is_current for r in bob2] == [False, False, True]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_scd2")
