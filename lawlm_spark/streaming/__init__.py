from lawlm_spark.streaming.events import (
    run_streaming_window_counts,
    session_window_counts,
    sliding_window_counts,
    tumbling_window_counts,
    watermarked_dedup,
)
from lawlm_spark.streaming.stateful import stateful_running_totals

__all__ = [
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_counts",
    "watermarked_dedup",
    "run_streaming_window_counts",
    "stateful_running_totals",
]
