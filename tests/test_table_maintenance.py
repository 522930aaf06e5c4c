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


def test_compact_leaves_no_staging_dirs(spark, sf_small, tmp_path):
    """Delete-last swap: after success neither the staging nor the
    pre-compact generation may linger; a stale staging dir from a crashed
    run must not break re-entry."""
    src = spark.read.parquet(f"{sf_small}/region.parquet")
    path = str(tmp_path / "ds")
    src.repartition(5).write.parquet(path)
    # simulate a crashed previous run's leftovers
    os.makedirs(path + "__compacting", exist_ok=True)
    compact_parquet(spark, path)
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__precompact")
    assert spark.read.parquet(path).count() == src.count()


def test_upsert_staged_swap_cleans_up(spark):
    from data_engineering_zoomcamp_my_test_spark.sinks import upsert_table

    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    base.write.mode("overwrite").saveAsTable("t_upsert")
    try:
        upsert_table(
            spark,
            "t_upsert",
            spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
            "id",
        )
        got = {r.id: r.v for r in spark.table("t_upsert").collect()}
        assert got == {1: "a", 2: "B", 3: "c"}
        # swap artifacts are gone
        assert not spark.catalog.tableExists("t_upsert__staging")
        assert not spark.catalog.tableExists("t_upsert__old")
    finally:
        for t in ("t_upsert", "t_upsert__staging", "t_upsert__old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_jdbc_roundtrip_embedded_derby(spark):
    """A4's network-sink arm: write over JDBC to an embedded Derby DB and
    read it back. Skipped when no embedded driver is available."""
    import pytest

    from data_engineering_zoomcamp_my_test_spark.sinks import write_jdbc

    url = "jdbc:derby:memory:enginetest;create=true"
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id long, v string")
    try:
        assert write_jdbc(df, url, "t_jdbc", if_exists="replace")
    except Exception as exc:  # pragma: no cover - env-dependent
        if "ClassNotFound" in str(exc) or "No suitable driver" in str(exc):
            pytest.skip(f"no embedded JDBC driver: {exc}")
        raise
    back = spark.read.jdbc(url, "t_jdbc")
    assert sorted(map(tuple, back.collect())) == [(1, "x"), (2, "y"), (3, "z")]
    # append arm doubles the rows
    assert write_jdbc(df, url, "t_jdbc", if_exists="append")
    assert spark.read.jdbc(url, "t_jdbc").count() == 6


def test_compact_reinstates_survivor_after_mid_swap_crash(spark, sf_small, tmp_path):
    """Crash between the two renames: dataset path missing, __precompact is
    the only copy. Re-entry must RESTORE it, not delete it."""
    import shutil

    src = spark.read.parquet(f"{sf_small}/region.parquet")
    path = str(tmp_path / "ds2")
    src.coalesce(1).write.parquet(path)
    n_rows = src.count()
    # simulate: rename committed, swap-in never happened
    shutil.move(path, path + "__precompact")
    assert not os.path.exists(path)
    compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == n_rows
    assert not os.path.exists(path + "__precompact")
    assert not os.path.exists(path + "__compacting")


def test_table_swap_recovery_restores_old_generation(spark):
    """A swap that died between renames leaves only __old; the next upsert
    (and recover_table_swap) must reinstate it rather than shadow it."""
    from data_engineering_zoomcamp_my_test_spark.sinks import upsert_table
    from data_engineering_zoomcamp_my_test_spark.sinks.writers import (
        recover_table_swap,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    base.write.mode("overwrite").saveAsTable("t_swaprec__old")  # crashed state
    try:
        assert recover_table_swap(spark, "t_swaprec")
        got = {r.id: r.v for r in spark.table("t_swaprec").collect()}
        assert got == {1: "a", 2: "b"}
        # and a subsequent upsert merges against the recovered base
        upsert_table(
            spark,
            "t_swaprec",
            spark.createDataFrame([(3, "c")], "id long, v string"),
            "id",
        )
        assert spark.table("t_swaprec").count() == 3
    finally:
        for t in ("t_swaprec", "t_swaprec__old", "t_swaprec__staging"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cdc_snapshot_compaction(spark):
    """I/U/D changelog reduces to the live snapshot: updates win by seq,
    deletes erase, re-inserts after delete resurrect."""
    from data_engineering_zoomcamp_my_test_spark.sinks import cdc_snapshot

    log = spark.createDataFrame(
        [
            (1, 1, "I", "a1"),
            (1, 2, "U", "a2"),       # update wins
            (2, 1, "I", "b1"),
            (2, 2, "D", None),       # deleted
            (3, 1, "I", "c1"),
            (3, 2, "D", None),
            (3, 3, "I", "c2"),       # resurrected
        ],
        "id long, seq long, op string, v string",
    )
    got = {r.id: r.v for r in cdc_snapshot(log, "id", "seq").collect()}
    assert got == {1: "a2", 3: "c2"}


def test_cdc_snapshot_same_seq_tie_is_stated_contract(spark):
    """ADVICE r2: at equal seq the op code breaks the tie ('U' > 'I' > 'D'),
    so a colliding delete loses and the key survives — now a documented
    contract, asserted here."""
    from data_engineering_zoomcamp_my_test_spark.sinks import cdc_snapshot

    log = spark.createDataFrame(
        [(1, 1, "I", "x"), (1, 2, "D", None), (1, 2, "U", "y")],
        "id long, seq long, op string, v string",
    )
    got = {r.id: r.v for r in cdc_snapshot(log, "id", "seq").collect()}
    assert got == {1: "y"}


def test_cdc_snapshot_validate_unique_seq(spark):
    """Opt-in strictness: validate_unique_seq raises (at execution, in the
    same shuffle) on any key with a duplicated seq; clean logs pass."""
    import pytest

    from data_engineering_zoomcamp_my_test_spark.sinks import cdc_snapshot

    dirty = spark.createDataFrame(
        [(1, 1, "I", "x"), (1, 2, "D", None), (1, 2, "U", "y")],
        "id long, seq long, op string, v string",
    )
    with pytest.raises(Exception, match="duplicate seq"):
        cdc_snapshot(dirty, "id", "seq", validate_unique_seq=True).collect()

    clean = spark.createDataFrame(
        [(1, 1, "I", "x"), (1, 2, "U", "y"), (2, 1, "I", "z")],
        "id long, seq long, op string, v string",
    )
    got = {
        r.id: r.v
        for r in cdc_snapshot(clean, "id", "seq", validate_unique_seq=True).collect()
    }
    assert got == {1: "y", 2: "z"}
