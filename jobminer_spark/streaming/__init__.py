from jobminer_spark.streaming.windows import (
    run_streaming_session_windows,
    run_streaming_sliding_counts,
    run_streaming_tumbling_counts,
    streaming_events_source,
)

__all__ = [
    "run_streaming_session_windows",
    "run_streaming_sliding_counts",
    "run_streaming_tumbling_counts",
    "streaming_events_source",
]
