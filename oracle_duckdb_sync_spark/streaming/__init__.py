from .incremental import (
    run_stream_once,
    stream_source,
    stream_time_bucket,
    stream_upsert_sink,
    stateful_running_stats,
)

__all__ = [
    "run_stream_once",
    "stateful_running_stats",
    "stream_source",
    "stream_time_bucket",
    "stream_upsert_sink",
]
