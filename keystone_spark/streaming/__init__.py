from keystone_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "read_events_stream",
    "run_available_now",
]
