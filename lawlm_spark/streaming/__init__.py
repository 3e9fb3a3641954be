from lawlm_spark.streaming.events import (
    run_streaming_window_counts,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "tumbling_window_counts",
    "sliding_window_counts",
    "run_streaming_window_counts",
]
