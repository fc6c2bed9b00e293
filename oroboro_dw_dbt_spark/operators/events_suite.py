"""Catalog entries for event analytics, Structured Streaming, JSON
extraction, and the multimodal binary plumbing.

`st_stream_windowed` is special: the Spark side runs a REAL streaming
query (file source → watermark → windowed agg → AvailableNow → memory
sink) while the oracle is a plain batch GROUP BY — a hash match is the
exactly-once/streaming-batch-parity assertion. The stateful sessionizer
has no SQL equivalent (state machine semantics) → rows-only check, with
its semantics pinned against `st_sessionize` in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.multimodal import (
    extract_media_features,
    media_from_documents,
    sample_frames,
)
from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table
from oroboro_dw_dbt_spark.streaming import (
    run_stream_windowed_counts,
    sessionize_batch,
    stateful_sessions_stream,
    stream_dedup_events,
    stream_stream_join,
    windowed_event_counts,
)

_WINDOWED_ORACLE = """
SELECT
  date_trunc('hour', ts) AS win_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


@query(
    "st_windowed_counts",
    oracle=_WINDOWED_ORACLE,
    survey_ref="beyond-reference: event-time tumbling-window aggregation (batch plan)",
)
def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(load_table(spark, sf_dir, "events"))


@query(
    "st_stream_windowed",
    oracle=_WINDOWED_ORACLE,
    survey_ref="beyond-reference: Structured Streaming windowed agg == batch oracle",
)
def st_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the one catalog entry that actually runs readStream → writeStream
    return run_stream_windowed_counts(spark, sf_dir)


@query(
    "st_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    survey_ref="beyond-reference: gap-based sessionization (lag + running sum)",
)
def st_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_batch(load_table(spark, sf_dir, "events"))


@query(
    "st_stateful_sessions",
    # the state machine emits CLOSED sessions only (the trailing open
    # session per user stays in state), so the oracle is the batch
    # sessionization SQL restricted to non-final sessions per user —
    # a full hash check of the custom stateful operator
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_seq,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
      FROM numbered
      GROUP BY user_id, session_seq
    )
    SELECT user_id, session_start, session_end, n_events, sum_value
    FROM sessions
    QUALIFY session_seq < max(session_seq) OVER (PARTITION BY user_id)
    """,
    survey_ref="beyond-reference: applyInPandasWithState custom stateful operator",
)
def st_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful_sessions_stream(spark, sf_dir)


@query(
    "st_stream_dedup",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
    survey_ref="beyond-reference: streaming exactly-once dedup "
    "(dropDuplicatesWithinWatermark over an at-least-once feed)",
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Spark side streams the events DOUBLED; matching the pristine
    # batch table proves every duplicate was dropped, none over-dropped
    return stream_dedup_events(spark, sf_dir)


@query(
    "st_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    survey_ref="beyond-reference: watermarked stream-stream interval "
    "join == batch interval join (bounded state via time range)",
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_join(spark, sf_dir)


@query(
    "ev_json_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    survey_ref="beyond-reference: semi-structured JSON prop extraction",
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@query(
    "mm_media_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(ascii(text) AS INT) AS first_byte,
           CAST(ascii(substr(text, length(text), 1)) AS INT) AS last_byte
    FROM documents
    """,
    survey_ref="beyond-reference: multimodal binary feature extraction (mapInPandas)",
)
def mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ASCII corpus ⇒ byte features over the binary payload equal char
    # features over text — lets the Arrow kernel be oracle-checked
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return extract_media_features(media)


@query(
    "mm_sample_frames",
    oracle="""
    WITH exploded AS (
      SELECT doc_id, text,
             unnest(range(CAST(ceil(length(text) / 100.0) AS BIGINT))) AS i
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(substr(text, CAST(i AS INT) * 100 + 1, 100)) AS frame_hash
    FROM exploded
    """,
    survey_ref="beyond-reference: frame sampling fan-out (mapInPandas, 1→k rows)",
)
def mm_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return sample_frames(media)


@query(
    "st_stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    survey_ref="beyond-reference: Structured Streaming stream-static "
    "enrichment join == batch join oracle (stateless, no watermark)",
)
def st_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.streaming import stream_static_join

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return stream_static_join(spark, sf_dir, dim)


@query(
    "st_stream_upsert",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    survey_ref="beyond-reference: streaming CDC upsert — foreachBatch "
    "newer-wins merge through the engine's atomic table swap; result "
    "independent of micro-batch chopping == batch argmax oracle",
)
def st_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.streaming import stream_upsert_latest

    return stream_upsert_latest(spark, sf_dir)
