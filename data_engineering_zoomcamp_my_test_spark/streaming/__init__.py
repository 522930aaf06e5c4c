from .windows import (
    batch_session_agg,
    batch_sliding_agg,
    batch_tumbling_agg,
    run_streaming_session_agg,
    run_streaming_sliding_agg,
    run_streaming_tumbling_agg,
    stream_to_parquet_exactly_once,
    streaming_tumbling_agg,
)

__all__ = [
    "batch_session_agg",
    "batch_sliding_agg",
    "batch_tumbling_agg",
    "run_streaming_session_agg",
    "run_streaming_sliding_agg",
    "run_streaming_tumbling_agg",
    "stream_to_parquet_exactly_once",
    "streaming_tumbling_agg",
]
