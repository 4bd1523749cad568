"""Structured Streaming layer (SURVEY.md §2.2 streaming rows, M5).

The event-time operators here are the SAME window expressions the
batch registry entries use (operators/windows_time.py) wired into
readStream/writeStream with watermarks — Spark's unified model means
stream-batch equivalence is a library guarantee we test, not a
reimplementation.
"""

from dataextractor_spark.streaming.windows import (
    dedup_events_stream,
    events_stream,
    run_available_now,
    session_aggregate,
    sliding_aggregate,
    stage_stream_input,
    tumbling_aggregate,
)

__all__ = [
    "dedup_events_stream",
    "events_stream",
    "run_available_now",
    "session_aggregate",
    "sliding_aggregate",
    "stage_stream_input",
    "tumbling_aggregate",
]
