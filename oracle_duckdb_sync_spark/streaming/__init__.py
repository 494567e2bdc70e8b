from .incremental import (
    run_stream_once,
    stateful_running_stats,
    stream_dedup_ingest,
    stream_dedup_keys,
    stream_semantic_ingest,
    stream_substring_ingest,
    stream_session_windows,
    stream_sliding_time_bucket,
    stream_source,
    stream_stream_interval_join,
    stream_time_bucket,
    stream_upsert_sink,
)

__all__ = [
    "run_stream_once",
    "stateful_running_stats",
    "stream_dedup_ingest",
    "stream_dedup_keys",
    "stream_semantic_ingest",
    "stream_substring_ingest",
    "stream_session_windows",
    "stream_sliding_time_bucket",
    "stream_source",
    "stream_stream_interval_join",
    "stream_time_bucket",
    "stream_upsert_sink",
]
