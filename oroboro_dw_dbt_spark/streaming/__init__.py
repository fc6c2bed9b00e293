from oroboro_dw_dbt_spark.streaming.jobs import (
    run_stream_windowed_counts,
    sessionize_batch,
    stream_dedup_events,
    stream_static_join,
    stream_upsert_latest,
    stream_stream_join,
    stateful_sessions_stream,
    windowed_event_counts,
)

__all__ = [
    "run_stream_windowed_counts",
    "sessionize_batch",
    "stream_dedup_events",
    "stream_static_join",
    "stream_upsert_latest",
    "stream_stream_join",
    "stateful_sessions_stream",
    "windowed_event_counts",
]
