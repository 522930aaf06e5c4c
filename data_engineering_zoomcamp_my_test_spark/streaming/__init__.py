from .windows import (
    batch_tumbling_agg,
    run_streaming_tumbling_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "batch_tumbling_agg",
    "run_streaming_tumbling_agg",
    "streaming_tumbling_agg",
]
