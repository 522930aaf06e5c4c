"""C11: streaming/batch parity — the same events replayed through a
watermarked Structured Streaming query must equal the batch aggregation."""

from __future__ import annotations

import os

from data_engineering_zoomcamp_my_test_spark.sources.tables import load_table
from data_engineering_zoomcamp_my_test_spark.streaming import (
    batch_session_agg,
    batch_tumbling_agg,
    run_streaming_session_agg,
    run_streaming_tumbling_agg,
)


def test_streaming_batch_parity(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")

    # Re-land the events as micro-precision parquet "file drops" (several
    # files so the stream sees multiple micro-batches).
    drop_dir = str(tmp_path / "drops")
    events.repartition(4).write.parquet(drop_dir)

    batch = batch_tumbling_agg(spark.read.parquet(drop_dir))
    stream = run_streaming_tumbling_agg(spark, drop_dir, query_name="parity_out")

    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s
    assert len(b) > 0


def test_streaming_session_parity(spark, sf_small, tmp_path):
    """Stateful session_window streaming == batch session_window on replay."""
    events = load_table(spark, sf_small, "events")
    drop_dir = str(tmp_path / "sess_drops")
    events.repartition(3).write.parquet(drop_dir)

    batch = batch_session_agg(spark.read.parquet(drop_dir))
    stream = run_streaming_session_agg(spark, drop_dir, query_name="sess_parity")

    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s and len(b) > 0


def test_streaming_sliding_parity(spark, sf_small, tmp_path):
    from data_engineering_zoomcamp_my_test_spark.streaming import (
        batch_sliding_agg,
        run_streaming_sliding_agg,
    )

    events = load_table(spark, sf_small, "events")
    drop_dir = str(tmp_path / "slide_drops")
    events.repartition(3).write.parquet(drop_dir)

    batch = batch_sliding_agg(spark.read.parquet(drop_dir))
    stream = run_streaming_sliding_agg(spark, drop_dir, query_name="slide_parity")
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, stream.collect()))


def test_foreach_batch_exactly_once_resume(spark, sf_small, tmp_path):
    """Checkpointed foreachBatch pipeline: restart after new files arrive
    processes only the new data; total output is complete with no dupes."""
    from data_engineering_zoomcamp_my_test_spark.streaming import (
        stream_to_parquet_exactly_once,
    )

    events = load_table(spark, sf_small, "events")
    first = events.filter("event_id % 2 = 0")
    second = events.filter("event_id % 2 = 1")

    src = str(tmp_path / "eo_src")
    out = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")
    first.repartition(2).write.parquet(src)

    stream_to_parquet_exactly_once(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    second.repartition(2).write.mode("append").parquet(src)
    stream_to_parquet_exactly_once(spark, src, out, ckpt)  # resume, same ckpt
    got = spark.read.parquet(out)
    assert got.count() == events.count()  # complete
    assert got.select("event_id").distinct().count() == events.count()  # no dupes


def test_streaming_is_incremental(spark, sf_small, tmp_path):
    """Late-arriving file lands -> rerun picks it up (file-source replay)."""
    events = load_table(spark, sf_small, "events")
    first = events.filter("event_id % 2 = 0")
    second = events.filter("event_id % 2 = 1")

    drop_dir = str(tmp_path / "drops2")
    first.write.parquet(drop_dir)
    out1 = run_streaming_tumbling_agg(spark, drop_dir, query_name="inc_out1")
    n1 = out1.agg({"n_events": "sum"}).collect()[0][0]

    second.write.mode("append").parquet(drop_dir)
    out2 = run_streaming_tumbling_agg(spark, drop_dir, query_name="inc_out2")
    n2 = out2.agg({"n_events": "sum"}).collect()[0][0]

    assert n1 == first.count()
    assert n2 == events.count()
    assert os.path.isdir(drop_dir)
