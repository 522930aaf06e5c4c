"""Structured Streaming operators (SURVEY.md §2.3 C11).

Streaming analog of operators/events.py: watermarked tumbling-window
aggregation over the events stream. The batch and streaming formulations
share one aggregation builder, so replaying the same rows through the stream
provably produces the batch answer (the parity test in
tests/test_streaming.py).

At scale this runs over a real source (Kafka/file drops) with the watermark
bounding state; in tests the parquet-backed file source + ``memory`` sink
drive it synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dmoney_sum, money

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _windowed_agg(df: DataFrame, window: str) -> DataFrame:
    return (
        df.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dmoney_sum(money("value"), "total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def batch_tumbling_agg(events: DataFrame, window: str = "1 hour") -> DataFrame:
    return _windowed_agg(events, window)


def _sliding_agg(df: DataFrame, window: str, slide: str) -> DataFrame:
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dmoney_sum(money("value"), "total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "total_value",
        )
    )


def batch_sliding_agg(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    return _sliding_agg(events, window, slide)


def run_streaming_sliding_agg(
    spark: SparkSession,
    source_dir: str,
    query_name: str = "slide_out",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    agg = _sliding_agg(stream.withWatermark("ts", watermark), window, slide)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_tumbling_agg(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming aggregation over a file-drop directory of
    parquet event batches (micro-precision ts)."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return _windowed_agg(stream.withWatermark("ts", watermark), window)


def _session_agg(df: DataFrame, gap: str) -> DataFrame:
    return (
        df.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dmoney_sum(money("value"), "total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def batch_session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    return _session_agg(events, gap)


def run_streaming_session_agg(
    spark: SparkSession,
    source_dir: str,
    query_name: str = "session_out",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming sessionization (session_window + watermark),
    driven to completion over the files currently in ``source_dir``."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    agg = _session_agg(stream.withWatermark("ts", watermark), gap)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def stream_to_parquet_exactly_once(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once file pipeline: ``foreachBatch`` writes each micro-batch
    to an epoch-scoped parquet path (idempotent overwrite on replay) while
    the checkpoint tracks source offsets — restart resumes from the last
    committed batch without duplicating output. This is the Spark-native
    replacement for the reference's fetch->store pipeline when the source is
    a continuously-landing directory."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 2)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_streaming_tumbling_agg(
    spark: SparkSession,
    source_dir: str,
    query_name: str = "stream_out",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive the streaming agg to completion over the files currently in
    ``source_dir`` (complete mode -> memory sink) and return the result."""
    agg = streaming_tumbling_agg(spark, source_dir, window, watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_dedup(
    spark: SparkSession,
    source_path: str,
    checkpoint: str,
    query_name: str = "dedup_out",
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
):
    """Streaming ingest deduplication — the stream-side twin of the batch
    dedup family (c1/c29): ``dropDuplicatesWithinWatermark`` keeps one row
    per key among events whose timestamps fall within the watermark bound,
    so replayed/at-least-once sources (Kafka redeliveries, file re-drops)
    don't double-count, while state stays bounded by the watermark (the
    unbounded-state failure of plain ``dropDuplicates`` on streams).
    Returns the started query writing append-mode to a memory sink."""
    stream = spark.readStream.schema(EVENTS_DDL).parquet(source_path)
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
