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


@query(
    "ts_gap_fill",
    # per-user hourly grid (sequence/generate_series between that user's
    # own first and last hour), zero-filled counts + forward-filled last
    # known value — the time-series resample/ffill staple
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             count(*) AS n, max(value) AS hour_max
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(hour) AS hmin, max(hour) AS hmax
      FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hour
      FROM span
    )
    SELECT g.user_id, g.hour,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
           last_value(h.hour_max IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_known_value
    FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    """,
    survey_ref="beyond-reference: time-series gap-fill — per-entity hourly "
    "resample (explode of a per-row sequence, no global grid) with "
    "zero-fill and forward-fill",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("hour_max"))
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("hmin"), F.max("hour").alias("hmax")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("hour_max", ignorenulls=True).over(w).alias("last_known_value"),
        )
    )


@query(
    "ev_funnel_steps",
    # strictly-ordered funnel view -> click -> purchase: each step's
    # timestamp is the first qualifying event AFTER the previous step
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
    survey_ref="beyond-reference: ordered funnel analysis — progressive "
    "min-after-previous-step; two small rejoins, shuffle on user_id "
    "reused",
)
def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
    )


@query(
    "ev_cohort_retention",
    # cohort = ISO week of first activity; k = whole weeks since cohort;
    # integer week arithmetic on both engines (no date subtleties)
    oracle="""
    WITH firstw AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST((epoch(a.week) - epoch(f.cohort_week)) / 604800 AS INT) AS week_k,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN firstw f USING (user_id)
    GROUP BY 1, 2
    """,
    survey_ref="beyond-reference: cohort retention — first-activity week "
    "cohorts, distinct-active per offset week",
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts")
    firstw = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = ev.select("user_id", wk.alias("week")).distinct()
    week_k = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("int")
    return (
        activity.join(firstw, "user_id")
        .groupBy("cohort_week", week_k.alias("week_k"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


@query(
    "st_session_window_builtin",
    # Spark's native session_window(gap): an event at EXACTLY start+gap
    # begins a new session (windows are [ts, ts+gap)), hence >= in the
    # oracle's new-session flag; session_end = last ts + gap
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, sid
    """,
    survey_ref="beyond-reference: native session_window(gap) aggregation "
    "— the built-in twin of st_sessionize's manual island windows; "
    "streaming-ready (same expression under a watermark)",
)
def st_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "ev_json_typed",
    # is_valid is "document parsed AS THE DECLARED SCHEMA", not raw
    # json_valid(): Spark PERMISSIVE from_json returns a NON-null struct
    # with null fields even for '{not json' (round-4 advice — the old
    # p.isNotNull() definition could never be false for non-empty input,
    # and only greened because the fixture has no malformed props). The
    # Spark signal is the _corrupt_record column; the oracle restates the
    # same schema-conformance predicate: syntactically valid AND a JSON
    # object AND k absent/null/integral. Probed divergences this covers:
    # mis-typed k ('{"k":"abc"}', '{"k":1.5}'), arrays, 'null' docs,
    # single-quoted JSON (allowSingleQuotes=false pins Jackson to spec).
    oracle="""
    WITH j AS (
      SELECT event_id, props,
             CASE WHEN json_valid(props)
                  THEN json_type(CAST(props AS JSON)) = 'OBJECT'
                  ELSE false END AS is_obj,
             CASE WHEN json_valid(props)
                  THEN json_type(CAST(props AS JSON), '$.k') END AS kt,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS ks
      FROM events WHERE event_id % 7 = 0
    )
    SELECT event_id,
           CASE WHEN is_obj AND kt IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(ks AS INT) END AS k,
           COALESCE(is_obj AND (kt IS NULL OR kt = 'NULL'
                    OR (kt IN ('BIGINT', 'UBIGINT')
                        AND TRY_CAST(ks AS INT) IS NOT NULL)), false) AS is_valid
    FROM j
    """,
    survey_ref="beyond-reference: schema-enforced JSON parsing "
    "(from_json -> typed struct, corrupt-record malformed signal)",
)
def ev_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json projects props into a declared
    struct once (one parse per row, pushed next to the scan), with
    schema-violating rows flagged via the corrupt-record channel — the
    semi-structured ingestion contract at scale, where a single bad
    document must not kill a 100 TB job but must stay auditable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    parsed = ev.withColumn("p", _json_typed_struct(F.col("props")))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p").isNotNull() & F.col("p._corrupt_record").isNull()).alias(
            "is_valid"
        ),
    )


def _json_typed_struct(props):
    """from_json with the schema-conformance contract ev_json_typed
    certifies: PERMISSIVE + explicit corrupt-record capture, Jackson's
    single-quote laxness disabled so "valid" matches the JSON spec."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    return F.from_json(
        props,
        schema,
        {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt_record",
            "allowSingleQuotes": "false",
        },
    )


@query(
    "ev_value_histogram",
    # equal-width binning spelled as pure arithmetic (floor(v/width),
    # clamped) — identical on any engine, no reliance on a histogram
    # builtin whose bucket-edge conventions differ
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 50), 9) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="beyond-reference: equal-width histogram per series "
    "(single map-side-combined aggregation — the distribution-profile "
    "shape)",
)
def ev_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value distribution per event_type in 10 fixed-width bins (last
    bin open-ended). One shuffle on (type, bin) with partial
    aggregation; at 100 TB this is the cheap first look at any metric's
    shape — and the exact-arithmetic binning (floor + clamp) means any
    engine reproduces the same buckets."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int")
    return ev.groupBy("event_type", bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


def _phash_bit_sql(b: int, blocks: int = 16) -> str:
    """bit b of the byte-level perceptual hash, as exact integer SQL
    (list slice is 1-based inclusive ⇒ [s+1 : e] ≡ python [s:e])."""
    s = f"({b} * n) // {blocks}"
    e = f"(({b} + 1) * n) // {blocks}"
    return (
        f"(CASE WHEN list_sum(bytes[{s} + 1 : {e}]) * n"
        f" > total * ({e} - {s}) THEN {1 << b} ELSE 0 END)"
    )


@query(
    "mm_phash_near_dup",
    # restates the integer block-sum hash bit-for-bit over the UTF-8
    # text twin (payload bytes ARE the text bytes — ASCII fixture), then
    # the same 2-band pigeonhole join and Hamming<=1 verify
    oracle=f"""
    WITH base AS (
      SELECT doc_id, length(text) AS n,
             list_transform(string_split(text, ''), x -> ord(x)) AS bytes
      FROM documents
    ),
    tot AS (SELECT doc_id, n, bytes, list_sum(bytes) AS total FROM base),
    ph AS (
      SELECT doc_id, {" + ".join(_phash_bit_sql(b) for b in range(16))} AS phash
      FROM tot
    ),
    bands AS (
      SELECT doc_id, phash, b.band, (phash >> (b.band * 8)) & 255 AS band_val
      FROM ph, (VALUES (0), (1)) AS b(band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(CAST(a.phash AS BIGINT), CAST(b.phash AS BIGINT))) AS INT)
             AS hamming
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
    WHERE bit_count(xor(CAST(a.phash AS BIGINT), CAST(b.phash AS BIGINT))) <= 1
    """,
    survey_ref="beyond-reference: perceptual-hash near-dup over media "
    "payloads (Arrow kernel hash -> pigeonhole band join, Hamming<=1)",
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dups: byte-level perceptual hash per payload (Arrow
    kernel, integer-exact bits) then the SimHash-style banded join —
    never all-pairs over binary columns. The decode-then-DCT pHash of a
    real deployment swaps into the same kernel seam."""
    from oroboro_dw_dbt_spark.multimodal import phash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return phash_near_dup_pairs(media_from_documents(docs), k=1)


@query(
    "mm_decode_meta",
    # a REAL decode roundtrip, executable in this sandbox: documents are
    # wrapped in spec-valid containers (BMP / PCM RIFF-WAVE / RIFF-AVI
    # with avih) whose geometry derives modularly from the text length,
    # then decode_media parses the BINARY HEADERS back with struct
    # semantics. The oracle recomputes every field straight from
    # length(text) — a hash match means the bytes written and the bytes
    # parsed agree on dimensions, channels, rate, units, and duration.
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           true AS ok,
           CASE doc_id % 3
                WHEN 0 THEN length(text) % 31 + 1
                WHEN 2 THEN length(text) % 63 + 2 END AS width,
           CASE doc_id % 3
                WHEN 0 THEN length(text) % 17 + 1
                WHEN 2 THEN length(text) % 37 + 2 END AS height,
           CASE doc_id % 3
                WHEN 0 THEN 3
                WHEN 1 THEN 1 + length(text) % 2 END AS channels,
           CASE doc_id % 3
                WHEN 1 THEN 8000 * (1 + length(text) % 3) END AS sample_rate,
           CAST(CASE doc_id % 3
                WHEN 0 THEN (length(text) % 31 + 1) * (length(text) % 17 + 1)
                WHEN 1 THEN length(text)
                ELSE length(text) % 300 + 1 END AS BIGINT) AS n_units,
           CASE doc_id % 3
                WHEN 1 THEN round(length(text) * 1000.0
                                  / (8000 * (1 + length(text) % 3)), 6)
                WHEN 2 THEN round((length(text) % 50000 + 20000)
                                  * (length(text) % 300 + 1) / 1000.0, 6)
                END AS duration_ms
    FROM documents
    """,
    survey_ref="beyond-reference: multimodal decode — real container "
    "parsing (BMP/WAV/AVI headers) through the Arrow kernel seam; the "
    "PIL/torchaudio/decord kernel swaps in with the same plan + schema",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.multimodal import decode_media, encode_media_containers

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(encode_media_containers(docs))
    return decoded.withColumn("duration_ms", F.round("duration_ms", 6))


@query(
    "ev_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || ' > ' || t1 || ' > ' || t2 AS path,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE t2 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path LIMIT 20
    """,
    survey_ref="beyond-reference: clickstream path mining (top event "
    "trigrams — lead-window sequences, no self-joins)",
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavior paths: per-user lead() windows build
    the trigram in one pass (the self-join-free way to mine sequences),
    then a map-side-combined count. One shuffle on user_id for the
    window, one on the trigram string — path cardinality is |types|^3,
    tiny at any corpus size."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    return (
        seq.select(
            "user_id",
            F.concat_ws(" > ", "event_type", "t1", "t2").alias("path"),
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Ordered funnel conversion: view -> click -> purchase
# ---------------------------------------------------------------------------
@query(
    "ev_funnel",
    # each stage requires a strictly LATER event than the previous
    # stage's completion time — the ordered-funnel semantic (a purchase
    # before the first view does not convert), computed in two bounded
    # aggregates, never a per-user sort of the whole event log
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click_after_view', CAST(count(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, 'purchase_after_click', CAST(count(*) AS BIGINT) FROM p
    ) t
    """,
    survey_ref="beyond-reference: ordered funnel analysis — stagewise "
    "conditional-min aggregation (product-analytics staple; each stage "
    "is a groupBy + semi-join, shuffle on user_id reused throughout)",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: first view, first click AFTER that view,
    first purchase AFTER that click; one row per stage with surviving
    user counts. Each stage is a filtered groupBy(user_id) joined to
    the previous stage's completion times — every shuffle is on
    user_id, so at 100 TB the three stages co-partition and the event
    log streams once per stage with map-side pre-aggregation."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        ).select("stage", "step", "n_users")

    return (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "click_after_view"))
        .unionByName(stage(p, 3, "purchase_after_click"))
    )
