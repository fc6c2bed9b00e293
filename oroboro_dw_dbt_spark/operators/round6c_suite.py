"""Round-6 sixth wave: behavioral sequences, label curation, metric
confidence, URL-canonical dedup, and the interval-overlap join.

Five shapes a production corpus/analytics pipeline needs that nothing
in the catalog covered yet:

- ``ev_sequence_match`` — ordered event-pattern detection (the
  MATCH_RECOGNIZE shape): first view→click→purchase chain per user,
  each step within a bounded lookback, via two stacked RANGE windows —
  O(n log n) per user-partition, no self-joins.
- ``lab_majority_vote`` — 3-annotator majority-vote gold labels with
  unanimity/split diagnostics and latent-truth accuracy (the labeling
  half the kappa entry measures).
- ``ml_bootstrap_ci`` — Poisson bootstrap over deterministic integer
  hashes: 32 resampled accuracy estimates from ONE pass, the
  confidence-interval machinery for eval metrics at corpus scale.
- ``dd_url_canonical`` — URL canonicalization dedup: four messiness
  classes (case, trailing slash, utm_* tracking params + fragment,
  default port) recovered to one canonical key via real parsing.
- ``j_interval_overlap`` — interval×interval overlap join through
  coarse time-bucket explosion + equi-join with an emit-once guard —
  the O(collisions) substitute for the nested-loop inequality join.

House rules as everywhere in this catalog (operators/catalog.py):
integer/fixed-point arithmetic, explicit tiebreaks, identical aliases
on both engines. The reference has no analog for any of these (its
surface is 3 BigQuery models — models/marts/core/*.sql); they extend
the engine the way SURVEY §6 scopes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

# Seconds offsets from 2024-01-01 keep every packed intermediate far
# inside BIGINT: the events table spans 30 days → off_s < 2^22.
_ORIGIN_S = 1704067200
_PACK = 4194304  # 2^22
_LOOKBACK_S = 3 * 86400


@query(
    "ev_sequence_match",
    # The oracle is the SAME two-layer window program in DuckDB SQL:
    # layer 1 finds the latest view within 3 days strictly before each
    # row; layer 2 propagates (click, its-view) packed as one BIGINT to
    # the purchases. Packing makes "the click AND the view it chains
    # from" a single max() — order-independent, tie-free.
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) - {_ORIGIN_S} AS off_s
      FROM events
    ),
    l1 AS (
      SELECT *,
             max(CASE WHEN event_type = 'view' THEN off_s END) OVER (
               PARTITION BY user_id ORDER BY off_s
               RANGE BETWEEN {_LOOKBACK_S} PRECEDING AND 1 PRECEDING
             ) AS last_view
      FROM e
    ),
    l2 AS (
      SELECT *,
             max(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                      THEN off_s * {_PACK} + last_view END) OVER (
               PARTITION BY user_id ORDER BY off_s
               RANGE BETWEEN {_LOOKBACK_S} PRECEDING AND 1 PRECEDING
             ) AS chain_pack
      FROM l1
    ),
    chains AS (
      SELECT user_id, event_id, off_s AS p_off,
             chain_pack // {_PACK} AS c_off,
             chain_pack % {_PACK} AS v_off
      FROM l2
      WHERE event_type = 'purchase' AND chain_pack IS NOT NULL
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY user_id ORDER BY p_off, event_id
             ) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_chains
      FROM chains
    )
    SELECT user_id, CAST(n_chains AS BIGINT) AS n_chains,
           make_timestamp((v_off + {_ORIGIN_S}) * 1000000) AS view_ts,
           make_timestamp((c_off + {_ORIGIN_S}) * 1000000) AS click_ts,
           make_timestamp((p_off + {_ORIGIN_S}) * 1000000) AS purchase_ts
    FROM ranked WHERE rn = 1
    """,
    survey_ref="beyond-reference: ordered event-sequence detection "
    "(MATCH_RECOGNIZE shape) — view→click→purchase chains via stacked "
    "RANGE windows, no self-joins",
)
def ev_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First view→click→purchase chain per user, steps ≤3 days apart.

    Two window passes over ONE (user_id, off_s) sort: pass 1 tags each
    row with the latest view in its 3-day lookback; pass 2 propagates
    qualifying clicks to purchases with the view PACKED into the same
    BIGINT (click·2²² + view), so one max() carries the whole chain —
    no per-step self-join, no arrays. Content is order-independent:
    RANGE frames are value-defined and max() is commutative.

    Scale: cost is the per-user sort both windows share (Catalyst
    reuses the exchange+sort). State is the 3-day frame, not the
    stream; at 100 TB this is the canonical sessionized-funnel plan —
    partition by user, never shuffle the fact twice."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_timestamp("ts") - _ORIGIN_S).alias("off_s"),
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("off_s")
        .rangeBetween(-_LOOKBACK_S, -1)
    )
    l1 = e.withColumn(
        "last_view",
        F.max(
            F.when(F.col("event_type") == "view", F.col("off_s"))
        ).over(frame),
    )
    l2 = l1.withColumn(
        "chain_pack",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("last_view").isNotNull(),
                F.col("off_s") * _PACK + F.col("last_view"),
            )
        ).over(frame),
    )
    chains = l2.filter(
        (F.col("event_type") == "purchase")
        & F.col("chain_pack").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.col("off_s").alias("p_off"),
        (F.col("chain_pack") / _PACK).cast("bigint").alias("c_off"),
        (F.col("chain_pack") % _PACK).alias("v_off"),
    )
    by_user = Window.partitionBy("user_id")
    ranked = chains.withColumn(
        "rn",
        F.row_number().over(by_user.orderBy("p_off", "event_id")),
    ).withColumn("n_chains", F.count(F.lit(1)).over(by_user))

    def ts(off: str) -> F.Column:
        return F.timestamp_seconds(F.col(off) + _ORIGIN_S)

    return ranked.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("n_chains").cast("bigint").alias("n_chains"),
        ts("v_off").alias("view_ts"),
        ts("c_off").alias("click_ts"),
        ts("p_off").alias("purchase_ts"),
    )


# Annotator votes: same latent truth + flip model as lab_agreement
# (ml_eval_suite._VOTES_SQL) so the two label-quality entries measure
# the same synthetic labeling process.
_TRUTH = "((doc_id * 2654435761) % 100 < 50)"
_VOTE = "({t} <> ((doc_id * {m} + {o}) % 100 < 20))"


@query(
    "lab_majority_vote",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, lang,
             CASE WHEN {_TRUTH} THEN 1 ELSE 0 END AS t,
             CASE WHEN {_VOTE.format(t=_TRUTH, m=31, o=7)} THEN 1 ELSE 0 END AS v1,
             CASE WHEN {_VOTE.format(t=_TRUTH, m=53, o=11)} THEN 1 ELSE 0 END AS v2,
             CASE WHEN {_VOTE.format(t=_TRUTH, m=97, o=3)} THEN 1 ELSE 0 END AS v3
      FROM documents
    ),
    g AS (
      SELECT lang, t, v1 + v2 + v3 AS s,
             CASE WHEN v1 + v2 + v3 >= 2 THEN 1 ELSE 0 END AS gold
      FROM v
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(gold) AS BIGINT) AS n_gold_pos,
           CAST(sum(CASE WHEN s IN (0, 3) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unanimous,
           CAST(sum(CASE WHEN gold = t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct
    FROM g GROUP BY lang
    """,
    survey_ref="beyond-reference: majority-vote gold-label "
    "construction with unanimity and latent-accuracy diagnostics — "
    "the labeling step lab_agreement's kappa measures",
)
def lab_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-annotator majority vote → per-language gold-label report.

    Row-local vote construction (pure BIGINT mod arithmetic, zero
    data movement) then ONE combining groupBy to |langs| rows. With
    an odd annotator count the majority always exists — no tie rule
    needed; n_unanimous vs n_docs is the consensus-rate diagnostic
    and n_correct/n_docs the (here-knowable) label error rate."""
    docs = load_table(spark, sf_dir, "documents")
    t = ((F.col("doc_id") * F.lit(2654435761)) % 100 < 50).cast("int")

    def vote(m: int, o: int) -> F.Column:
        flip = (F.col("doc_id") * m + o) % 100 < 20
        return (t.cast("boolean") != flip).cast("int")

    s = vote(31, 7) + vote(53, 11) + vote(97, 3)
    g = docs.select(
        "lang",
        t.alias("t"),
        s.alias("s"),
        (s >= 2).cast("int").alias("gold"),
    )
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("gold").cast("bigint").alias("n_gold_pos"),
        F.sum(F.col("s").isin(0, 3).cast("int"))
        .cast("bigint")
        .alias("n_unanimous"),
        F.sum((F.col("gold") == F.col("t")).cast("int"))
        .cast("bigint")
        .alias("n_correct"),
    )


# Poisson(1) inverse CDF at 1e-4 resolution: P(X<=k) cumulative,
# scaled to 0..10000. A uniform integer hash u∈[0,10000) maps to the
# resample weight via these thresholds — deterministic, no rand().
_POIS = (3679, 7358, 9197, 9810, 9963)
_B = 32


@query(
    "ml_bootstrap_ci",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_TRUTH} THEN 1 ELSE 0 END AS label,
             CASE WHEN {_TRUTH} <> ((doc_id * 193 + 29) % 100 < 15)
                  THEN 1 ELSE 0 END AS pred
      FROM documents
    ),
    x AS (
      SELECT d.*, b.b,
             (d.doc_id * 1103515245 + b.b * 12345 + 7) % 10000 AS u
      FROM d CROSS JOIN (SELECT unnest(range(0, {_B})) AS b) b
    ),
    w AS (
      SELECT b, pred, label,
             CASE WHEN u < {_POIS[0]} THEN 0
                  WHEN u < {_POIS[1]} THEN 1
                  WHEN u < {_POIS[2]} THEN 2
                  WHEN u < {_POIS[3]} THEN 3
                  WHEN u < {_POIS[4]} THEN 4
                  ELSE 5 END AS w
      FROM x
    )
    SELECT CAST(b AS BIGINT) AS b,
           CAST(sum(w) AS BIGINT) AS n_w,
           CAST(sum(CASE WHEN pred = label THEN w ELSE 0 END) AS BIGINT)
             AS correct_w,
           CAST(CAST(sum(CASE WHEN pred = label THEN w ELSE 0 END) * 1000000
                     AS BIGINT) // sum(w) AS BIGINT) AS acc_ppm
    FROM w GROUP BY b
    """,
    survey_ref="beyond-reference: Poisson-bootstrap confidence "
    "intervals for eval metrics — 32 deterministic resamples in one "
    "pass, integer-exact accuracy per resample",
)
def ml_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32 Poisson-bootstrap resamples of classifier accuracy, exact.

    The classic driver-side bootstrap (B passes over sampled copies)
    is unusable at corpus scale; the Poisson bootstrap replaces it
    with per-row integer weights — here a deterministic LCG-style
    hash of (doc_id, b) through the Poisson(1) inverse CDF, so the
    resamples are reproducible on any cluster and oracle-checkable.
    One explode(0..31) + one combining groupBy: the corpus is read
    once, shuffle carries 32 rows of state per partition. acc_ppm is
    integer floor division — no float in the certified values; the
    CI is read off the 32-row result (rank 2 / rank 30 ≈ 90% CI)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = (F.col("doc_id") * F.lit(2654435761)) % 100 < 50
    noise = (F.col("doc_id") * 193 + 29) % 100 < 15
    d = docs.select(
        "doc_id",
        truth.cast("int").alias("label"),
        (truth != noise).cast("int").alias("pred"),
    )
    x = d.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b")
    ).withColumn(
        "u",
        (F.col("doc_id") * F.lit(1103515245) + F.col("b") * 12345 + 7)
        % 10000,
    )
    w = (
        F.when(F.col("u") < _POIS[0], 0)
        .when(F.col("u") < _POIS[1], 1)
        .when(F.col("u") < _POIS[2], 2)
        .when(F.col("u") < _POIS[3], 3)
        .when(F.col("u") < _POIS[4], 4)
        .otherwise(5)
    )
    correct_w = F.when(F.col("pred") == F.col("label"), F.col("w")).otherwise(0)
    return (
        x.withColumn("w", w)
        .groupBy(F.col("b").cast("bigint").alias("b"))
        .agg(
            F.sum("w").cast("bigint").alias("n_w"),
            F.sum(correct_w).cast("bigint").alias("correct_w"),
        )
        .select(
            "b",
            "n_w",
            "correct_w",
            F.expr("correct_w * 1000000 div n_w").alias("acc_ppm"),
        )
    )


@query(
    "dd_url_canonical",
    # Every messy variant is synthesized from (k = doc_id//4, host
    # class k%7), so the oracle can state the canonical form directly
    # and group — while Spark must RECOVER it by parsing. A hash match
    # certifies scheme/host lowercasing, default-port stripping,
    # trailing-slash normalization, utm_* removal and fragment drop.
    oracle="""
    WITH c AS (
      SELECT doc_id, doc_id // 4 AS k FROM documents
    )
    SELECT 'https://h' || (k % 7) || '.example.com/docs/' || k
             AS canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS rep_doc_id
    FROM c GROUP BY k
    """,
    survey_ref="beyond-reference: URL canonicalization dedup — the "
    "web-corpus exact-dedup key (case, default port, trailing slash, "
    "utm_* tracking params, fragments)",
)
def dd_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize four messiness classes of the same URL and dedup.

    doc_id % 4 picks the mess: clean / UPPERCASE host + trailing
    slash / utm_* params + #fragment / explicit :443 + uppercase
    scheme. Canonicalization is parse_url + Column string ops — all
    row-local, so the only shuffle is the final canonical-key groupBy
    (the same shape as dd_exact). At 100 TB this is step zero of web
    corpus dedup: ~30% of crawl duplicates are URL-trivial and never
    need to reach MinHash."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.expr("doc_id div 4")
    host = F.concat(F.lit("h"), (k % 7).cast("string"), F.lit(".example.com"))
    path = F.concat(F.lit("/docs/"), k.cast("string"))
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(F.lit("https://"), host, path))
        .when(
            m == 1,
            F.concat(F.lit("https://"), F.upper(host), path, F.lit("/")),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://"),
                host,
                path,
                F.lit("?utm_source=feed&utm_campaign=x#frag"),
            ),
        )
        .otherwise(
            F.concat(F.lit("HTTPS://"), host, F.lit(":443"), path)
        )
    )
    raw = docs.select("doc_id", url.alias("url"))
    proto = F.lower(F.parse_url(F.col("url"), F.lit("PROTOCOL")))
    # parse_url HOST keeps the port when present — strip :443 then
    # lowercase; the empty-string port case never arises here.
    host_c = F.lower(
        F.regexp_replace(
            F.parse_url(F.col("url"), F.lit("HOST")), ":443$", ""
        )
    )
    path_c = F.regexp_replace(
        F.parse_url(F.col("url"), F.lit("PATH")), "/+$", ""
    )
    # drop utm_* params, then tidy separators left behind
    q = F.parse_url(F.col("url"), F.lit("QUERY"))
    q_c = F.regexp_replace(q, "(^|&)utm_[^&]*", "")
    q_c = F.regexp_replace(q_c, "^&", "")
    canon = F.concat(
        proto,
        F.lit("://"),
        host_c,
        path_c,
        F.when(
            q_c.isNotNull() & (q_c != ""), F.concat(F.lit("?"), q_c)
        ).otherwise(F.lit("")),
    )
    return (
        raw.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep_doc_id"),
        )
    )


_BUCKET_DAYS = 7


@query(
    "j_interval_overlap",
    # oracle: the plain inequality join DuckDB evaluates with its
    # IEJoin — the semantics the bucketed plan must reproduce exactly
    oracle=f"""
    WITH l AS (
      SELECT o_orderkey AS l_id, o_custkey % 40 AS key,
             CAST(o_orderdate AS DATE) AS l_s,
             CAST(o_orderdate AS DATE)
               + INTERVAL (o_orderkey % 5 + 1) DAY AS l_e
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    r AS (
      SELECT o_orderkey AS r_id, o_custkey % 40 AS key,
             CAST(o_orderdate AS DATE) AS r_s,
             CAST(o_orderdate AS DATE)
               + INTERVAL (o_orderkey % 7 + 1) DAY AS r_e
      FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT l.key AS key, l_id, r_id,
           CAST(date_diff('day',
                greatest(l_s, r_s), least(l_e, r_e)) AS BIGINT)
             AS overlap_days
    FROM l JOIN r ON l.key = r.key AND l_s <= r_e AND r_s <= l_e
    """,
    survey_ref="beyond-reference: interval×interval overlap join via "
    "coarse-bucket explosion + emit-once guard — the distributed "
    "substitute for the nested-loop inequality join (extends "
    "tj_range_join from point-in-interval to interval-interval)",
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (left, right) interval pairs sharing a key.

    Each interval explodes into the 7-day buckets it touches (≤2 here:
    intervals are 1–7 days); the join is then a plain (key, bucket)
    equi-join + residual overlap predicate. A pair sharing several
    buckets would duplicate, so emit ONLY in the first bucket both
    occupy — bucket == max(l_start_bucket, r_start_bucket) — an O(1)
    guard instead of a distinct shuffle.

    Scale: candidate work is O(overlapping pairs + bucket collisions),
    never |L|·|R|; bucket width trades replication (interval_len/width
    copies) against collision fan-in, exactly like tj_range_join. Both
    sides shuffle once on (key, bucket) — AQE handles a hot bucket."""
    orders = load_table(spark, sf_dir, "orders")

    def side(mod: int, id_alias: str, s_alias: str, e_alias: str, span_mod: int) -> DataFrame:
        return orders.filter(F.col("o_orderkey") % 3 == mod).select(
            F.col("o_orderkey").alias(id_alias),
            (F.col("o_custkey") % 40).alias("key"),
            F.to_date("o_orderdate").alias(s_alias),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.col("o_orderkey") % span_mod + 1).cast("int"),
            ).alias(e_alias),
        )

    left = side(0, "l_id", "l_s", "l_e", 5)
    right = side(1, "r_id", "r_s", "r_e", 7)

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        b_lo = F.expr(f"datediff({s}, DATE'1970-01-01') div {_BUCKET_DAYS}")
        b_hi = F.expr(f"datediff({e}, DATE'1970-01-01') div {_BUCKET_DAYS}")
        return df.withColumn(
            "bucket", F.explode(F.sequence(b_lo, b_hi))
        ).withColumn("s_bucket", b_lo)

    lb = bucketed(left, "l_s", "l_e").withColumnRenamed("s_bucket", "l_sb")
    rb = bucketed(right, "r_s", "r_e").withColumnRenamed("s_bucket", "r_sb")
    joined = lb.join(rb, ["key", "bucket"]).filter(
        (F.col("l_s") <= F.col("r_e"))
        & (F.col("r_s") <= F.col("l_e"))
        & (F.col("bucket") == F.greatest("l_sb", "r_sb"))
    )
    return joined.select(
        F.col("key").cast("bigint").alias("key"),
        "l_id",
        "r_id",
        F.datediff(
            F.least("l_e", "r_e"), F.greatest("l_s", "r_s")
        ).cast("bigint").alias("overlap_days"),
    )


# ---------------------------------------------------------------------------
# Metadata-only aggregates: COUNT/MIN/MAX served from the manifest.
# ---------------------------------------------------------------------------
@query(
    "eng_metadata_count",
    # the oracle recomputes the same aggregates by SCANNING the source
    # table — a hash match proves the manifest's footer-derived numbers
    # equal ground truth exactly
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(ts) AS ts_min, max(ts) AS ts_max,
           CAST(min(user_id) AS BIGINT) AS user_min,
           CAST(max(user_id) AS BIGINT) AS user_max
    FROM events
    """,
    survey_ref="engine: metadata-only COUNT/MIN/MAX "
    "(ManifestParquetFormat.stats_summary — the manifest fast path, "
    "refused whenever delete vectors could falsify it)",
)
def eng_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*)/MIN/MAX answered from the manifest, zero data scan.

    The builder lands events as a manifest table (footer row counts +
    ts/user_id zone maps collected at write time), then the aggregate
    row is assembled from ``stats_summary`` — pure driver-side JSON,
    KBs at any table size. The oracle scans; we don't. The summary
    REFUSES under delete vectors / missing bounds rather than guess
    (pytest covers the refusals) — the honesty contract that makes a
    metadata fast path safe to wire into a planner."""
    import datetime as dt
    import tempfile
    from pathlib import Path

    from pyspark.sql import types as T

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="meta_wh_")) / "events_meta"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    fmt = ManifestParquetFormat()
    fmt.write(events.repartition(8), table, stats_cols=("ts", "user_id"))
    s = fmt.stats_summary(table, cols=("ts", "user_id"))
    row = (
        int(s["n_rows"]),
        dt.datetime.fromisoformat(s["ts"][0]),
        dt.datetime.fromisoformat(s["ts"][1]),
        int(s["user_id"][0]),
        int(s["user_id"][1]),
    )
    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("ts_min", T.TimestampType()),
            T.StructField("ts_max", T.TimestampType()),
            T.StructField("user_min", T.LongType()),
            T.StructField("user_max", T.LongType()),
        ]
    )
    return spark.createDataFrame([row], schema)


# ---------------------------------------------------------------------------
# Watermarked LEFT-OUTER stream-stream join over a planned feed.
# ---------------------------------------------------------------------------
def _join_outer_oracle() -> str:
    from oroboro_dw_dbt_spark.sources.pydatasource import (
        JOIN_BOUND_S,
        JOIN_PLAN,
        JOIN_SENTINEL_L,
    )

    def vals(side: str) -> str:
        return ", ".join(
            f"({i}, {u}, {ep})"
            for batch in JOIN_PLAN
            for s, i, u, ep in batch
            if s == side
        )

    return f"""
    WITH l(l_id, user_id, l_ep) AS (VALUES {vals("L")}),
    r(r_id, r_user, r_ep) AS (VALUES {vals("R")})
    SELECT CAST(l_id AS BIGINT) AS l_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(l_ep AS BIGINT) AS l_ep,
           CAST(r_id AS BIGINT) AS r_id,
           CAST(r_ep AS BIGINT) AS r_ep
    FROM l LEFT JOIN r
      ON r_user = user_id AND r_ep BETWEEN l_ep AND l_ep + {JOIN_BOUND_S}
    WHERE l_id <> {JOIN_SENTINEL_L}
    """


@query(
    "st_stream_join_outer",
    # the oracle is the BATCH left join over the same planned rows,
    # excluding the left sentinel (whose state the stream must never
    # flush). A hash match certifies all four contracts at once:
    # matches emit, unmatched-left emits NULL after eviction,
    # unmatched-right emits nothing, unevicted state emits nothing.
    oracle=_join_outer_oracle(),
    survey_ref="streaming semantics: watermarked LEFT OUTER "
    "stream-stream join — NULL emission is an eviction-time decision, "
    "certified over a planned two-sided feed "
    "(sources/pydatasource.py JOIN_PLAN)",
)
def st_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer stream-stream join: the NULL rows are the contract.

    Inner stream-stream joins emit on match; the OUTER variant also
    has to decide a negative — "this left row will never match" — and
    that decision is only sound at watermark eviction time. The feed's
    per-side event times are monotone (nothing arrives late) and the
    closing sentinels push both sides' watermarks past every real
    row's bound, so the final sink content is decidable on paper under
    any watermark-effectiveness lag (the lesson LATE_PLAN encodes).

    Scale: state is watermark-bounded on both sides (the time-bound
    join condition is what permits GC); NULL emission adds no extra
    shuffle — it rides the eviction sweep. The poll-settle-recheck
    drain asserts no EXTRA rows trickle out after the expected set."""
    import time
    import uuid

    from oroboro_dw_dbt_spark.sources.pydatasource import (
        JOIN_BOUND_S,
        JOIN_PLAN,
        JOIN_SENTINEL_L,
        register_joinfeed,
    )

    register_joinfeed(spark)
    # expected final row count, derived from the plan itself
    lefts = [
        (i, u, ep) for b in JOIN_PLAN for s, i, u, ep in b if s == "L"
    ]
    rights = [
        (i, u, ep) for b in JOIN_PLAN for s, i, u, ep in b if s == "R"
    ]
    expected = sum(
        max(
            1,
            sum(
                1
                for _, ru, rep in rights
                if ru == u and ep <= rep <= ep + JOIN_BOUND_S
            ),
        )
        for i, u, ep in lefts
        if i != JOIN_SENTINEL_L
    )

    def side(tag: str, prefix: str):
        return (
            spark.readStream.format("joinfeed")
            .load()
            .filter(F.col("side") == tag)
            .select(
                F.col("id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.timestamp_seconds("ep").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", f"{JOIN_BOUND_S} seconds")
        )

    left, right = side("L", "l"), side("R", "r")
    joined = left.join(
        right,
        (F.col("r_user") == F.col("l_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.expr(f"INTERVAL {JOIN_BOUND_S} SECONDS")
        ),
        "leftOuter",
    ).select(
        "l_id",
        F.col("l_user").alias("user_id"),
        F.unix_timestamp("l_ts").alias("l_ep"),
        "r_id",
        F.unix_timestamp("r_ts").alias("r_ep"),
    )
    name = f"joinfeed_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= expected:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError("join feed did not flush within 120 s")
        # settle: a buggy extra emission (e.g. the sentinel flushing)
        # must FAIL the gate, not race past it
        time.sleep(2.0)
    finally:
        q.stop()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Native session windows (batch F.session_window == gaps-and-islands).
# ---------------------------------------------------------------------------
_GAP_MIN = 30
_CENTS = "CAST(round(CAST(value AS DECIMAL(12,4)) * 100, 0) AS BIGINT)"


@query(
    "w_session_window",
    # the oracle is the classic gaps-and-islands spelling: session id =
    # running count of >30-min gaps per user; Spark runs the NATIVE
    # session_window operator — the hash match certifies the two
    # formulations compute the identical sessionization
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, {_CENTS} AS cents,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                  > {_GAP_MIN} * 60 * 1000000 OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT *,
             sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM e
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {_GAP_MIN} MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM s GROUP BY user_id, session_id
    """,
    survey_ref="beyond-reference: native batch session windows "
    "(F.session_window) certified against the gaps-and-islands SQL "
    "spelling — the two sessionization idioms proven equivalent",
)
def w_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions via the NATIVE session_window.

    The engine's session operator merges overlapping [ts, ts+gap)
    intervals inside a single aggregation — one shuffle on user_id,
    no window-function pass at all (contrast sessionize_batch's
    lag+cumsum, and the streaming twin st_sessionize). Certifying it
    against the gaps-and-islands oracle pins the exact boundary
    semantics (session end = last event + gap; a gap of EXACTLY 30
    min merges — [start, start+gap) intervals touching counts as
    overlap on both engines' definitions)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    return (
        e.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "cents",
        )
    )


# ---------------------------------------------------------------------------
# Text-line source: the last cell of the source-format matrix.
# ---------------------------------------------------------------------------
@query(
    "eng_text_source",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY lang
    """,
    survey_ref="S1 sources: text-line format (spark.read.text) — "
    "completing the CSV/JSON/ORC/parquet source matrix with the "
    "delimited-line roundtrip",
)
def eng_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip documents through a text-line landing zone.

    Writes one pipe-delimited line per doc (spark.write.text), reads
    the directory back with the text source, and re-derives the typed
    columns — the log-file/JSONL-adjacent ingest shape every pipeline
    starts from. Split is bounded (split(_, '|', 3)) so text bodies
    containing the delimiter would not shift columns; the aggregate
    certifies the parse recovered every row and value exactly."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="text_src_") + "/docs"
    lines = docs.select(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            "lang",
            F.col("n_chars").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    parsed = (
        spark.read.text(out)
        .select(F.split("value", "\\|", 3).alias("p"))
        .select(
            F.col("p")[0].cast("bigint").alias("doc_id"),
            F.col("p")[1].alias("lang"),
            F.col("p")[2].cast("bigint").alias("n_chars"),
        )
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas: Spark 4's arbitrary-stateful API.
#
# NOT a catalog entry in this container: the TWS state protocol speaks
# protobuf between the JVM and the Python driver worker, and
# google.protobuf is absent here (no pip installs) — the query crashes
# at StateMessage_pb2 import, observed and pinned in
# tests/test_round6c.py::TestTransformWithState (importorskip). The
# builder below is complete and oracle-shaped; in an environment with
# protobuf it certifies by the same batch-aggregate comparison, and
# applyInPandasWithState (st_stateful_sessions) covers the
# arbitrary-stateful contract in the gate meanwhile.
# ---------------------------------------------------------------------------
def st_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user totals through a custom StatefulProcessor.

    The processor keeps (n, cents) in ValueState and emits the updated
    snapshot for every key that saw input in a micro-batch; with
    maxFilesPerTrigger=2 over 8 files the feed is a REAL 4-batch
    stream, so a state-loss bug (e.g. state not persisted between
    batches) yields terminal snapshots below the batch totals and
    fails the hash. Terminal selection is argmax by n — emission
    counts per user depend on batching, the terminal value doesn't.

    Scale: this is the API for operators watermarks can't express
    (per-key models, CDC folds with custom conflict rules); state
    lives in RocksDB per partition, sized by keys not events."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from oroboro_dw_dbt_spark.streaming.jobs import _events_stream_dir

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("cents", T.LongType()),
                ]
            )
            self._agg = handle.getValueState("agg", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (
                tuple(self._agg.get()) if self._agg.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "cents": [cents]}
            )

        def close(self) -> None:
            pass

    import uuid

    src_dir = _events_stream_dir(spark, sf_dir)
    from oroboro_dw_dbt_spark.streaming.jobs import EVENTS_SCHEMA

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(src_dir)
            .select(
                "user_id",
                F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
                .cast("bigint")
                .alias("cents"),
            )
        )
        snapshots = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id bigint, n bigint, cents bigint",
            outputMode="Update",
            timeMode="None",
        )
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            snapshots.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.expr("max_by(cents, n)").cast("bigint").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Regression metrics: the eval family's missing half.
# ---------------------------------------------------------------------------
@query(
    "ml_regression_metrics",
    # y = event cents, ŷ = y + deterministic ±1000-cent noise. Every
    # sufficient statistic is an exact integer (decimal(38,0) for the
    # n·Σy² products); RMSE's sqrt is IEEE-exact (correctly rounded on
    # every conforming libm), so even the derived doubles hash-match.
    oracle=f"""
    WITH d AS (
      SELECT {_CENTS} AS y,
             {_CENTS} + ((event_id * 37 + 11) % 2001 - 1000) AS yhat
      FROM events
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(CAST(y - yhat AS HUGEINT) * (y - yhat)) AS BIGINT)
               AS sse,
             CAST(sum(abs(y - yhat)) AS BIGINT) AS sae
      FROM d
    )
    SELECT n, sse, sae,
           sqrt(CAST(sse AS DOUBLE) / n) AS rmse,
           CAST(sae AS DOUBLE) / n AS mae,
           1.0 - CAST(n AS DOUBLE) * sse
                 / CAST(n * syy - sy * sy AS DOUBLE) AS r2
    FROM s
    """,
    survey_ref="beyond-reference: regression metrics (RMSE/MAE/R²) "
    "from one pass of exact integer sufficient statistics — "
    "completing ml_eval's classification-only metric set",
)
def ml_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact RMSE / MAE / R² in a single aggregate pass.

    SSE, SAE, Σy, Σy² are integers (cents); R² uses the mean-free
    identity n·Σ(y−ȳ)² = n·Σy² − (Σy)², kept exact in decimal(38,0)
    (DuckDB HUGEINT) — at 10⁹ rows of 10⁵-cent values n·Σy² ≈ 10²⁴,
    past BIGINT but far inside 38 digits. One division (and one IEEE
    sqrt) at the very end. Scale: a combining aggregate — map-side
    partials, one 5-number row on the wire."""
    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    d = e.select(
        cents.alias("y"),
        (cents + ((F.col("event_id") * 37 + 11) % 2001 - 1000)).alias(
            "yhat"
        ),
    )
    err = F.col("y") - F.col("yhat")
    dec = "decimal(38,0)"
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(err * err).cast("bigint").alias("sse"),
        F.sum(F.abs(err)).cast("bigint").alias("sae"),
    )
    return s.select(
        "n",
        "sse",
        "sae",
        F.sqrt(F.col("sse").cast("double") / F.col("n")).alias("rmse"),
        (F.col("sae").cast("double") / F.col("n")).alias("mae"),
        (
            F.lit(1.0)
            - F.col("n").cast("double")
            * F.col("sse")
            / (
                F.col("n").cast(dec) * F.col("syy")
                - F.col("sy") * F.col("sy")
            ).cast("double")
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Version restore + shallow clone: the last two lifecycle verbs.
# ---------------------------------------------------------------------------
def _user_cents_state(sf_dir_expr: str, drop_mod: str) -> str:
    return f"""
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CENTS}) AS BIGINT) AS cents
      FROM events {drop_mod} GROUP BY user_id
    """


@query(
    "eng_restore_version",
    # phases: v2 (the "bad" overwrite drops %3 users), the restore
    # (back to the full v1 state), and post-vacuum (restore must keep
    # the shared data dir alive because it IS current)
    oracle=f"""
    WITH v1 AS ({_user_cents_state("", "")}),
    v2 AS ({_user_cents_state("", "WHERE user_id % 3 <> 0")}),
    ph AS (
      SELECT 'bad_overwrite' AS phase, count(*) AS n_users,
             sum(cents) AS cents FROM v2
      UNION ALL
      SELECT 'restored', count(*), sum(cents) FROM v1
      UNION ALL
      SELECT 'post_vacuum', count(*), sum(cents) FROM v1
    )
    SELECT phase, CAST(n_users AS BIGINT) AS n_users,
           CAST(cents AS BIGINT) AS cents
    FROM ph
    """,
    survey_ref="engine: RESTORE to version as a new commit "
    "(ManifestParquetFormat.restore) — O(1) metadata rollback, "
    "vacuum-safe because the restored snapshot is current",
)
def eng_restore_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undo a bad overwrite with a metadata-only RESTORE, then prove
    vacuum keeps the restored (shared) data dir alive.

    v1 = per-user totals; v2 = a 'bad' overwrite that lost every %3
    user; restore(v1) becomes v3 re-referencing v1's immutable files
    (nothing rewritten); vacuum(keep_last=1) reclaims v2's dir but the
    restored state survives — the rollback contract at any scale."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="restore_wh_")) / "t"
    fmt = ManifestParquetFormat()
    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    state = e.select("user_id", cents.alias("c")).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("cents"),
    )
    fmt.write(state, table)  # v1
    fmt.write(state.filter(F.col("user_id") % 3 != 0), table)  # v2: bad

    # each phase must be MATERIALIZED at its point in the lifecycle —
    # lazy phase frames would all evaluate after vacuum reclaimed v2
    def rollup(df: DataFrame, phase: str) -> tuple:
        r = df.agg(
            F.count(F.lit(1)).cast("bigint"),
            F.sum("cents").cast("bigint"),
        ).first()
        return (phase, r[0], r[1])

    phases = [rollup(fmt.read(spark, table), "bad_overwrite")]
    fmt.restore(table, 1)  # v3 == v1 content
    phases.append(rollup(fmt.read(spark, table), "restored"))
    fmt.vacuum(table, keep_last=1)
    phases.append(rollup(fmt.read(spark, table), "post_vacuum"))
    return spark.createDataFrame(
        phases, "phase string, n_users bigint, cents bigint"
    )


@query(
    "eng_shallow_clone",
    # phases: the clone equals the source snapshot; a later SOURCE
    # overwrite must not move the clone (it pins the version); deletes
    # on the CLONE must not touch the source
    oracle=f"""
    WITH v1 AS ({_user_cents_state("", "")}),
    ph AS (
      SELECT 'clone' AS phase, count(*) AS n_users, sum(cents) AS cents
      FROM v1
      UNION ALL
      SELECT 'clone_after_src_overwrite', count(*), sum(cents) FROM v1
      UNION ALL
      SELECT 'clone_after_own_delete', count(*), sum(cents)
      FROM v1 WHERE user_id % 5 <> 0
      UNION ALL
      SELECT 'src_final', count(*), sum(cents)
      FROM v1 WHERE user_id % 3 <> 0
    )
    SELECT phase, CAST(n_users AS BIGINT) AS n_users,
           CAST(cents AS BIGINT) AS cents
    FROM ph
    """,
    survey_ref="engine: shallow clone (CREATE TABLE CLONE shape) — "
    "zero-copy table fork with independent forward lifecycles "
    "(ManifestParquetFormat.clone)",
)
def eng_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy clone, then prove both lifecycles are independent.

    Clone pins source v1 in place (absolute data ref, no copy); the
    source then overwrites (clone unmoved) and the clone then deletes
    %5 users via its OWN merge-on-read vectors (source unmoved). At
    100 TB a clone is how a team forks the corpus for an experiment
    in O(1) — the alternative is a multi-day copy."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    root = Path(tempfile.mkdtemp(prefix="clone_wh_"))
    src, dst = root / "src", root / "clone"
    fmt = ManifestParquetFormat()
    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    state = e.select("user_id", cents.alias("c")).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("cents"),
    )
    fmt.write(state, src)  # src v1
    fmt.clone(src, dst)

    def rollup(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("cents").cast("bigint").alias("cents"),
        ).select(F.lit(phase).alias("phase"), "n_users", "cents")

    out = rollup(fmt.read(spark, dst), "clone")
    fmt.write(state.filter(F.col("user_id") % 3 != 0), src)  # src v2
    out = out.unionByName(
        rollup(fmt.read(spark, dst), "clone_after_src_overwrite")
    )
    doomed = state.filter(F.col("user_id") % 5 == 0).select("user_id")
    fmt.delete_keys(spark, dst, doomed, "user_id")
    out = out.unionByName(
        rollup(fmt.read(spark, dst), "clone_after_own_delete")
    )
    return out.unionByName(rollup(fmt.read(spark, src), "src_final"))


# ---------------------------------------------------------------------------
# A/B experiment readout: two-proportion z from exact counts.
# ---------------------------------------------------------------------------
@query(
    "ml_ab_proportions",
    # variant = user hash; converted = user has a >150-value purchase
    # (mid-range rate at every sf — "any purchase" saturates to 1.0 and
    # zeroes the z denominator). All four
    # sufficient statistics are exact BIGINTs; rates and the pooled z
    # are spelled as the IDENTICAL expression tree on both engines, so
    # the final doubles match bit-for-bit (IEEE ops are deterministic
    # given identical operand order).
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN (user_id * 2654435761) % 100 < 50
                  THEN 'a' ELSE 'b' END AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(sum(CASE WHEN variant = 'a' THEN converted ELSE 0 END)
             AS BIGINT) AS conv_a,
        CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b,
        CAST(sum(CASE WHEN variant = 'b' THEN converted ELSE 0 END)
             AS BIGINT) AS conv_b
      FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / n_a AS rate_a,
           CAST(conv_b AS DOUBLE) / n_b AS rate_b,
           (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt(
                 (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)
               ) AS z
    FROM s
    """,
    survey_ref="beyond-reference: A/B two-proportion z-test from "
    "exact counts — the experimentation readout (complements the "
    "drift family's chi-square)",
)
def ml_ab_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 user split.

    One per-user aggregate (did the user ever convert) then one
    4-counter combining aggregate; rates and the pooled z derive from
    those BIGINTs in a single final expression. Scale: the experiment
    readout is O(users) map-side + 4 numbers on the wire — re-runnable
    per metric/segment without touching the fact twice."""
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150)
                ).cast("int")
            ).alias("converted")
        )
        .select(
            F.when(
                (F.col("user_id") * F.lit(2654435761)) % 100 < 50, "a"
            )
            .otherwise("b")
            .alias("variant"),
            "converted",
        )
    )
    s = u.agg(
        F.sum((F.col("variant") == "a").cast("int"))
        .cast("bigint")
        .alias("n_a"),
        F.sum(
            F.when(F.col("variant") == "a", F.col("converted")).otherwise(0)
        )
        .cast("bigint")
        .alias("conv_a"),
        F.sum((F.col("variant") == "b").cast("int"))
        .cast("bigint")
        .alias("n_b"),
        F.sum(
            F.when(F.col("variant") == "b", F.col("converted")).otherwise(0)
        )
        .cast("bigint")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        z.alias("z"),
    )


# ---------------------------------------------------------------------------
# Boolean-aggregate function surface.
# ---------------------------------------------------------------------------
@query(
    "a_bool_agg_suite",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_pos,
           bool_or(value > 990) AS any_high,
           CAST(count_if(value > 500) AS BIGINT) AS n_big,
           CAST(count_if(value IS NULL) AS BIGINT) AS n_null_val,
           bool_and(user_id IS NOT NULL) AS users_complete
    FROM events GROUP BY event_type
    """,
    survey_ref="beyond-reference: boolean aggregate surface "
    "(bool_and/bool_or/count_if) — the data-quality assertion "
    "primitives as plain aggregates",
)
def a_bool_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / count_if per group, NULL semantics pinned.

    These are the aggregate forms data-quality checks compile to
    (engine/tests.py's not_null is a count_if at heart). Row-local
    predicates, one combining groupBy — map-side partials carry one
    boolean/long per (group, aggregate)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_pos"),
        F.bool_or(F.col("value") > 990).alias("any_high"),
        F.count_if(F.col("value") > 500).cast("bigint").alias("n_big"),
        F.count_if(F.col("value").isNull())
        .cast("bigint")
        .alias("n_null_val"),
        F.bool_and(F.col("user_id").isNotNull()).alias("users_complete"),
    )


# ---------------------------------------------------------------------------
# Dynamic partition overwrite: replace only the partitions in the batch.
# ---------------------------------------------------------------------------
@query(
    "eng_dynamic_partition_overwrite",
    # late-arriving corrections for 3 days (cents doubled) land via
    # dynamic overwrite; the other 27 day-partitions must be byte-
    # untouched. The oracle states the expected blended table.
    oracle=f"""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS day, user_id, {_CENTS} AS cents
      FROM events
    ),
    blended AS (
      SELECT day, user_id,
             CASE WHEN dayofmonth(day) IN (5, 6, 7)
                  THEN cents * 2 ELSE cents END AS cents
      FROM base
    )
    SELECT day, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM blended GROUP BY day
    """,
    survey_ref="S4 sinks: dynamic partition overwrite "
    "(partitionOverwriteMode=dynamic) — reprocess late days in place "
    "without rewriting or losing the other partitions",
)
def eng_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Overwrite ONLY the day-partitions present in the incoming batch.

    Static overwrite mode would TRUNCATE the table down to the 3
    corrected days — the classic reprocessing footgun; dynamic mode
    replaces exactly the partitions the batch carries. The entry lands
    30 day-partitions, rewrites days 5–7 with doubled cents, and
    certifies the blend. At 100 TB this is the daily-correction path:
    write amplification is O(corrected days), and readers never see a
    half-replaced partition (per-partition commit).

    The mode is set per-entry and restored — it changes INSERT
    OVERWRITE semantics session-wide and must not leak into other
    entries' writes."""
    import tempfile

    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    base = e.select(
        F.to_date("ts").alias("day"), "user_id", cents.alias("cents")
    )
    out = tempfile.mkdtemp(prefix="dyn_part_") + "/t"
    base.write.partitionBy("day").mode("overwrite").parquet(out)
    fix = base.filter(F.dayofmonth("day").isin(5, 6, 7)).withColumn(
        "cents", F.col("cents") * 2
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fix.write.partitionBy("day").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(out)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# LSH recall report: the false-negative rate measured as data.
# ---------------------------------------------------------------------------
from oroboro_dw_dbt_spark.operators.training_suite import (  # noqa: E402
    _minhash_cte,
    _SHINGLES_3,
)


@query(
    "dd_lsh_recall_report",
    # truth = the blocked exact-Jaccard pairs (dd_ngram_jaccard's
    # definition); lsh = the banded-MinHash verified pairs
    # (dd_minhash_lsh's). Both spellings already certify individually;
    # this entry certifies their SET RELATIONSHIP — tp/fn/extra counts
    # and the recall — so the LSH probabilistic guarantee ("8 hashes,
    # 4 bands of 2") is a measured, regression-checked number instead
    # of a docstring claim.
    oracle=f"""
    WITH {_minhash_cte()},
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (SELECT doc_id,
                   lang || '|' ||
                     CAST(CAST(floor(n_chars / 100) AS INT) AS STRING)
                     AS block,
                   {_SHINGLES_3} AS sh
            FROM documents) a
      JOIN (SELECT doc_id,
                   lang || '|' ||
                     CAST(CAST(floor(n_chars / 100) AS INT) AS STRING)
                     AS block,
                   {_SHINGLES_3} AS sh
            FROM documents) b
        ON a.block = b.block AND a.doc_id < b.doc_id
      WHERE round(len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
                  / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5
    ),
    lsh AS (
      SELECT DISTINCT ca.doc_id AS doc_a, cb.doc_id AS doc_b
      FROM bands ca
      JOIN bands cb ON ca.band = cb.band AND ca.band_key = cb.band_key
                   AND ca.doc_id < cb.doc_id
      JOIN sh sa ON ca.doc_id = sa.doc_id
      JOIN sh sb ON cb.doc_id = sb.doc_id
      WHERE round(len(list_filter(sa.shingles,
                                  x -> list_contains(sb.shingles, x))) * 1.0
                  / len(list_distinct(
                        list_concat(sa.shingles, sb.shingles))), 6) >= 0.5
    ),
    j AS (
      SELECT coalesce(t.doc_a, l.doc_a) AS doc_a,
             CASE WHEN t.doc_a IS NOT NULL AND l.doc_a IS NOT NULL
                  THEN 'tp'
                  WHEN l.doc_a IS NULL THEN 'fn' ELSE 'extra' END AS cls
      FROM truth t
      FULL OUTER JOIN lsh l
        ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b
    )
    SELECT
      CAST(sum(CASE WHEN cls IN ('tp', 'fn') THEN 1 ELSE 0 END) AS BIGINT)
        AS n_truth,
      CAST(sum(CASE WHEN cls IN ('tp', 'extra') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lsh,
      CAST(sum(CASE WHEN cls = 'tp' THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
      CAST(sum(CASE WHEN cls = 'fn' THEN 1 ELSE 0 END) AS BIGINT) AS n_fn,
      CAST(sum(CASE WHEN cls = 'extra' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_extra,
      CAST(CAST(sum(CASE WHEN cls = 'tp' THEN 1 ELSE 0 END) * 1000000
                AS BIGINT)
           // sum(CASE WHEN cls IN ('tp', 'fn') THEN 1 ELSE 0 END)
           AS BIGINT)
        AS recall_ppm
    FROM j
    """,
    survey_ref="beyond-reference: LSH recall meta-evaluation — the "
    "banded-MinHash false-negative rate vs blocked-exact truth, "
    "certified as data (the honesty artifact behind dd_minhash_lsh)",
)
def dd_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP/FN/extra census of LSH near-dup pairs vs exact truth.

    'extra' pairs are NOT false positives — they are exact-verified
    ≥0.5 pairs the blocked-truth baseline cannot see (LSH buckets
    cross the (lang, length-band) blocks). The number that matters is
    n_fn: every missed pair is a duplicate the corpus would keep.

    Scale: both inputs are the already-bucketed production plans; the
    census adds one pair-key full-outer join. Run it on a sampled
    corpus slice in production — recall is a statistic, not a
    per-document artifact."""
    from oroboro_dw_dbt_spark.dedup.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs).select("doc_a", "doc_b")
    lsh = minhash_lsh_pairs(docs).select(
        F.col("doc_a").alias("l_a"), F.col("doc_b").alias("l_b")
    )
    j = truth.join(
        lsh,
        (truth.doc_a == lsh.l_a) & (truth.doc_b == lsh.l_b),
        "full_outer",
    ).select(
        F.when(
            F.col("doc_a").isNotNull() & F.col("l_a").isNotNull(), "tp"
        )
        .when(F.col("l_a").isNull(), "fn")
        .otherwise("extra")
        .alias("cls")
    )
    return j.agg(
        F.sum(F.col("cls").isin("tp", "fn").cast("int"))
        .cast("bigint")
        .alias("n_truth"),
        F.sum(F.col("cls").isin("tp", "extra").cast("int"))
        .cast("bigint")
        .alias("n_lsh"),
        F.sum((F.col("cls") == "tp").cast("int"))
        .cast("bigint")
        .alias("n_tp"),
        F.sum((F.col("cls") == "fn").cast("int"))
        .cast("bigint")
        .alias("n_fn"),
        F.sum((F.col("cls") == "extra").cast("int"))
        .cast("bigint")
        .alias("n_extra"),
    ).select(
        "*",
        F.expr("n_tp * 1000000 div n_truth").alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# ANN recall census: LSH top-k vs the exact baseline, per query.
# ---------------------------------------------------------------------------
from oroboro_dw_dbt_spark.operators.training_suite import (  # noqa: E402
    QUERY_VEC_IDS,
    _COS,
    _planes_dot_sql,
)

_QIDS = ", ".join(str(i) for i in QUERY_VEC_IDS)


@query(
    "ss_lsh_recall_report",
    # exact top-5 and LSH-bucketed top-5 from the two already-certified
    # spellings; per query the census counts the overlap — recall@5 of
    # the hyperplane index measured as data, per query (the honesty
    # artifact behind the ss_lsh_* family)
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    exact_p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_COS} AS cosine
      FROM v q JOIN v c ON q.vec_id != c.vec_id
      WHERE q.vec_id IN ({_QIDS})
    ),
    exact_top AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM exact_p) t WHERE rank <= 5
    ),
    b AS (SELECT vec_id, v, {_planes_dot_sql('v')} AS bucket FROM v),
    lsh_p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_COS} AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
      WHERE q.vec_id IN ({_QIDS})
    ),
    lsh_top AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM lsh_p) t WHERE rank <= 5
    ),
    mp_p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {_COS} AS cosine
      FROM b q JOIN b c
        ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id != c.vec_id
      WHERE q.vec_id IN ({_QIDS})
    ),
    mp_top AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM mp_p) t WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 AS BIGINT) // count(*) AS recall_ppm,
           CAST(sum(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit_multiprobe,
           CAST(sum(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 AS BIGINT) // count(*) AS recall_mp_ppm
    FROM exact_top e
    LEFT JOIN lsh_top l
      ON e.query_id = l.query_id AND e.vec_id = l.vec_id
    LEFT JOIN mp_top m
      ON e.query_id = m.query_id AND e.vec_id = m.vec_id
    GROUP BY e.query_id
    """,
    survey_ref="beyond-reference: ANN recall@5 census — hyperplane-LSH "
    "top-k vs the exact baseline, per query, certified as data",
)
def ss_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the LSH index, measured per query.

    Joins the two production plans' outputs on (query, neighbor); the
    per-query hit count IS the recall numerator. Single-bucket LSH
    trades recall for candidate reduction — this census is the knob's
    dial (ss_lsh_multiprobe_topk is the knob). Scale: both inputs are
    k-row-per-query top-k results; the census join is KBs."""
    from oroboro_dw_dbt_spark.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(emb, QUERY_VEC_IDS, k=5).select(
        "query_id", "vec_id"
    )
    lsh = lsh_bucketed_topk(emb, QUERY_VEC_IDS, k=5).select(
        F.col("query_id").alias("l_q"), F.col("vec_id").alias("l_v")
    )
    from oroboro_dw_dbt_spark.similarity import lsh_multiprobe_topk

    mp = lsh_multiprobe_topk(emb, QUERY_VEC_IDS, k=5).select(
        F.col("query_id").alias("m_q"), F.col("vec_id").alias("m_v")
    )
    j = exact.join(
        lsh,
        (exact.query_id == lsh.l_q) & (exact.vec_id == lsh.l_v),
        "left",
    ).join(
        mp,
        (exact.query_id == mp.m_q) & (exact.vec_id == mp.m_v),
        "left",
    )
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum(F.col("l_v").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_hit"),
            F.sum(F.col("m_v").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_hit_multiprobe"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.expr("n_hit * 1000000 div n_exact").alias("recall_ppm"),
            "n_hit_multiprobe",
            F.expr("n_hit_multiprobe * 1000000 div n_exact").alias(
                "recall_mp_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# JSON function surface, tier 2.
# ---------------------------------------------------------------------------
@query(
    "f_json_suite2",
    # JSON synthesized from table columns → every extraction's ground
    # truth is known by construction (the f_url_suite pattern)
    oracle="""
    SELECT doc_id,
           lang AS path_lang,
           CAST(n_chars AS STRING) AS path_n,
           source AS path_tag1,
           CAST(doc_id AS STRING) AS tup_id,
           CASE WHEN n_chars > 500 THEN 'long' ELSE 'short' END AS tup_cls,
           NULL AS path_missing
    FROM documents
    """,
    survey_ref="beyond-reference: JSON path surface tier 2 "
    "(get_json_object nested/array paths, json_tuple multi-extract, "
    "absent-path NULL contract) — complements ev_json_extract/"
    "ev_variant_extract",
)
def f_json_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / json_tuple over synthesized JSON documents.

    Paths exercised: nested object ($.meta.lang), numeric leaf kept as
    string ($.meta.n), array index ($.tags[1]), multi-field
    json_tuple, and an absent path (NULL, never an error). Row-local
    Column trees — the JSON log-extraction shape with zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    cls = F.when(F.col("n_chars") > 500, "long").otherwise("short")
    j = F.concat(
        F.lit('{"id": "'),
        F.col("doc_id").cast("string"),
        F.lit('", "cls": "'),
        cls,
        F.lit('", "meta": {"lang": "'),
        F.col("lang"),
        F.lit('", "n": '),
        F.col("n_chars").cast("string"),
        F.lit('}, "tags": ["fixed", "'),
        F.col("source"),
        F.lit('"]}'),
    )
    raw = docs.select("doc_id", j.alias("j"))
    tup = F.json_tuple(F.col("j"), "id", "cls")
    return raw.select(
        "doc_id",
        F.get_json_object("j", "$.meta.lang").alias("path_lang"),
        F.get_json_object("j", "$.meta.n").alias("path_n"),
        F.get_json_object("j", "$.tags[1]").alias("path_tag1"),
        tup,
        F.get_json_object("j", "$.absent.path").alias("path_missing"),
    ).toDF(
        "doc_id",
        "path_lang",
        "path_n",
        "path_tag1",
        "tup_id",
        "tup_cls",
        "path_missing",
    )


# ---------------------------------------------------------------------------
# Batch sliding windows (tumbling's overlapping sibling).
# ---------------------------------------------------------------------------
@query(
    "w_sliding_window",
    # every event lands in exactly size/slide = 4 overlapping windows;
    # the oracle enumerates them arithmetically (start = aligned base
    # minus j slides), Spark uses the native sliding window() operator
    oracle=f"""
    WITH e AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, {_CENTS} AS cents
      FROM events
    ),
    x AS (
      SELECT (ep // 900) * 900 - j.j * 900 AS ws, cents
      FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
    )
    SELECT make_timestamp(ws * 1000000) AS window_start,
           make_timestamp((ws + 3600) * 1000000) AS window_end,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM x GROUP BY ws
    """,
    survey_ref="beyond-reference: batch SLIDING windows "
    "(window(ts, '1 hour', '15 minutes')) — the overlapping-window "
    "aggregation, tumbling's sibling (st_windowed_counts)",
)
def w_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min over the event stream.

    The native window() generator replicates each row into its
    size/slide = 4 windows map-side, then ONE combining groupBy —
    identical cost shape to explode+agg, with the overlap factor as
    the explicit map-side multiplier (×4 rows into the partial agg,
    never ×4 shuffle width: partials combine per window first)."""
    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    return (
        e.select("ts", cents.alias("cents"))
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "cents",
        )
    )


# ---------------------------------------------------------------------------
# Observation metrics: the in-flight data-quality counter hook.
# ---------------------------------------------------------------------------
@query(
    "p_observe_metrics",
    # the observed counters are collected DURING one pass of a real
    # query (no second scan); the oracle recomputes them as plain
    # aggregates — the hash match proves observe() counts every row
    # the query actually processed, exactly once
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_props,
           CAST(sum({_CENTS}) AS BIGINT) AS cents
    FROM events
    """,
    survey_ref="beyond-reference: df.observe() metric accumulators — "
    "free in-flight data-quality counters on a production write path "
    "(no second scan)",
)
def p_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect quality counters VIA observe() while a query runs.

    The pattern every production pipeline wants: row counts, violation
    counts and checksums accumulated during the write pass itself —
    zero extra scans, exact under retries (observe metrics are
    task-retry-consistent for deterministic aggregates). The entry
    materializes the observed values as the result; a double-count or
    dropped-partition bug in the hook breaks the hash."""
    from pyspark.sql import Observation

    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    obs = Observation("quality")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum((F.col("value") < 0).cast("int")).cast("bigint").alias("n_neg"),
        F.sum(F.col("props").isNull().cast("int"))
        .cast("bigint")
        .alias("n_null_props"),
        F.sum(cents).cast("bigint").alias("cents"),
    )
    # drive the pass (a production job would be writing here)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_neg"], m["n_null_props"], m["cents"])],
        "n_rows bigint, n_neg bigint, n_null_props bigint, cents bigint",
    )


# ---------------------------------------------------------------------------
# File provenance: the hidden _metadata column surface.
# ---------------------------------------------------------------------------
@query(
    "eng_file_provenance",
    # one file per day-partition by construction, so per-FILE counts
    # (via the hidden _metadata column) must equal per-day counts — the
    # oracle recomputes the latter straight from events
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
    survey_ref="S1 sources: hidden _metadata file-provenance columns — "
    "per-file lineage (the audit trail for quarantining a bad ingest "
    "file at 100 TB)",
)
def eng_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group a scan by its source FILE via the _metadata column.

    Lands events one file per day-partition, reads back with
    `_metadata.file_path`, recovers the day from the Hive partition
    path, and counts per file. This is the quarantine primitive: when
    one ingest file is bad, provenance turns 'rewrite the table' into
    'drop one file'. Zero-cost column — populated from the scan's own
    split metadata, no join."""
    import tempfile

    e = load_table(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="prov_") + "/t"
    (
        e.select(F.to_date("ts").alias("day"), "event_id")
        .repartition("day")
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).select(
        F.col("_metadata.file_path").alias("fp")
    )
    return (
        back.groupBy("fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.to_date(
                F.regexp_extract("fp", r"day=(\d{4}-\d{2}-\d{2})", 1)
            ).alias("day"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Incrementally-maintained LSH index: signatures computed ONLY for the
# ingest delta, index state == full rebuild.
# ---------------------------------------------------------------------------
from oroboro_dw_dbt_spark.operators.training_suite import (  # noqa: E402
    _minhash_cte,
)


@query(
    "dd_incremental_index",
    # the oracle is the FULL-REBUILD band index over all documents;
    # the entry builds the same state in two incremental runs where
    # run 2 shingles/minhashes only the day-2 delta
    oracle=f"""
    WITH {_minhash_cte()}
    SELECT doc_id, band, band_key FROM bands
    """,
    survey_ref="beyond-reference: incrementally-maintained LSH band "
    "index — the production dedup-index lifecycle (signatures only "
    "for the delta, never a corpus rescan; composes dd_incremental's "
    "anti-join with the engine's incremental materialization)",
)
def dd_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the MinHash band index across two ingest days.

    Day 1 indexes ⅔ of the corpus; day 2's run anti-joins the source
    against the EXISTING index ({{this}} self-reference) so shingling
    and minhashing — the expensive part — touch only the new docs; the
    engine's delete+insert-by-key merge folds them in. The hash match
    against the full-rebuild oracle certifies the maintained state is
    EXACTLY the rebuild state. At 100 TB you never re-sign the corpus:
    daily index cost is O(delta), and near-dup candidacy for new docs
    is one band equi-join against this table."""
    import tempfile

    from oroboro_dw_dbt_spark.dedup.dedup import minhash_band_index
    from oroboro_dw_dbt_spark.engine.dag import (
        ModelGraph,
        SourceRegistry,
        model,
    )

    docs_all = load_table(spark, sf_dir, "documents")
    state = {"day": 1}
    sources = SourceRegistry()
    sources.add_provider(
        "documents",
        lambda s: docs_all
        if state["day"] == 2
        else docs_all.filter(F.col("doc_id") % 3 != 0),
    )

    @model(
        name="band_index",
        materialized="incremental",
        unique_key=("doc_id", "band"),
    )
    def band_index(documents, this):
        delta = documents
        if this is not None:
            seen = this.select("doc_id").distinct()
            delta = documents.join(seen, "doc_id", "left_anti")
        return minhash_band_index(delta).withColumn(
            "band", F.col("band").cast("int")
        )

    graph = ModelGraph(
        sources, warehouse_dir=tempfile.mkdtemp(prefix="lshidx_"), threads=1
    )
    graph.add(band_index)
    graph.run(spark, select=["band_index"], run_tests=False)
    state["day"] = 2
    graph.run(spark, select=["band_index"], run_tests=False)
    return graph.frame("band_index")


# ---------------------------------------------------------------------------
# Degree statistics: the graph-shape profile.
# ---------------------------------------------------------------------------
@query(
    "gr_degree_stats",
    # same co-purchase edge construction as the graph suite's flavor:
    # user pairs sharing an event hour — here we just profile degrees
    oracle="""
    WITH edges AS (
      SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      FROM (SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
            FROM events WHERE event_type = 'purchase') a
      JOIN (SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
            FROM events WHERE event_type = 'purchase') b
        ON a.hr = b.hr AND a.user_id < b.user_id
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS u FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY u
    )
    SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY d
    """,
    survey_ref="beyond-reference: degree-distribution profile — the "
    "graph-shape diagnostic that sizes every iterative algorithm's "
    "skew (hub detection before pagerank/CC)",
)
def gr_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph.

    The pre-flight for every iterative graph job: the degree
    distribution IS the skew forecast (a 10⁶-degree hub means the
    edge⋈rank shuffle needs salting). Edges from an hour-bucket
    self-join (equi-join, candidates only), then two combining
    aggregates — node degrees, then the histogram."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("unix_timestamp(ts) div 3600").alias("hr"),
        )
    )
    a = e.alias("a")
    b = e.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.hr") == F.col("b.hr"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst")
        )
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("u")).unionAll(
        edges.select(F.col("dst").alias("u"))
    )
    deg = nodes.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


# ---------------------------------------------------------------------------
# Table-valued-function SQL surface: byte-identical text on both engines.
# ---------------------------------------------------------------------------
_TVF_SQL = """
    SELECT t.id AS k,
           v.name AS name,
           CAST(t.id * v.mult AS BIGINT) AS scaled
    FROM range(0, 10) AS t(id)
    JOIN (VALUES ('a', 2), ('b', 3)) AS v(name, mult)
      ON t.id % 2 = CASE v.name WHEN 'a' THEN 0 ELSE 1 END
"""


@query(
    "sql_tvf_surface",
    # the strongest dialect-parity statement: the oracle string IS the
    # Spark query string, byte for byte (range() TVF + VALUES inline
    # table + lateral-style aliasing)
    oracle=_TVF_SQL,
    survey_ref="beyond-reference: table-valued-function SQL surface "
    "(range() TVF, VALUES inline tables, table aliases with column "
    "lists) — identical SQL text on both engines, zero translation",
)
def sql_tvf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range() + VALUES through spark.sql, byte-identical to the oracle.

    Generator TVFs are how tests, calendars and probe grids enter SQL
    pipelines without a source table; certifying the same text on both
    engines pins the surface exactly (the sql_recursive_cte /
    sql_lateral_topn pattern, third instalment)."""
    return spark.sql(_TVF_SQL)


# ---------------------------------------------------------------------------
# Sliding windows as a REAL stream (the overlapping-state shape).
# ---------------------------------------------------------------------------
@query(
    "st_sliding_stream",
    # identical oracle to the batch twin w_sliding_window — the stream
    # must settle to the batch answer with ×4 overlapping windows of
    # state per event
    oracle=f"""
    WITH e AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, {_CENTS} AS cents
      FROM events
    ),
    x AS (
      SELECT (ep // 900) * 900 - j.j * 900 AS ws, cents
      FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
    )
    SELECT make_timestamp(ws * 1000000) AS window_start,
           make_timestamp((ws + 3600) * 1000000) AS window_end,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM x GROUP BY ws
    """,
    survey_ref="beyond-reference: SLIDING windows under Structured "
    "Streaming — overlapping window state (4 live windows per event) "
    "settles to the batch twin exactly (w_sliding_window)",
)
def st_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregation == the batch twin.

    Each arriving event updates FOUR window states (size/slide) — the
    state shape tumbling entries never exercise. Complete-mode memory
    sink for the settled comparison; production uses append +
    watermark where state stays bounded at (watermark span / slide)
    windows per key — the certified arithmetic is identical."""
    import uuid

    from oroboro_dw_dbt_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        _events_stream_dir,
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _events_stream_dir(spark, sf_dir)
    )
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .select("ts", cents.alias("cents"))
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "cents",
        )
    )
    name = f"slide_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles: the percentile pre-aggregation contract.
# ---------------------------------------------------------------------------
_HBIN = 500  # 5.00-unit bins over cents


@query(
    "sk_hist_quantiles_merge",
    # single-pass histogram quantiles in SQL; the entry ALSO builds the
    # histogram as 4 per-shard partials merged by integer addition and
    # certifies merge == single-pass (flag the oracle asserts true) —
    # the same contract sk_countmin_merge/sk_hll_merge certify for
    # frequency/distinct state, now for percentiles
    oracle=f"""
    WITH b AS (
      SELECT ({_CENTS} // {_HBIN}) AS bin, count(*) AS c
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT bin, c,
             sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER () AS total
      FROM b
    ),
    q AS (
      SELECT p.p AS pct,
             min(bin) FILTER (WHERE cum * 100 >= p.p * total) AS qbin
      FROM cum CROSS JOIN (VALUES (50), (90), (99)) AS p(p)
      GROUP BY p.p
    )
    SELECT CAST(pct AS BIGINT) AS pct,
           CAST(qbin * {_HBIN} AS BIGINT) AS cents_lo,
           CAST(qbin * {_HBIN} + {_HBIN} AS BIGINT) AS cents_hi,
           true AS merge_consistent
    FROM q
    """,
    survey_ref="beyond-reference: mergeable histogram quantiles — "
    "per-shard integer histograms merged by addition equal the "
    "single-pass histogram EXACTLY, so percentile state rolls up "
    "across days/shards without rescans (completes the mergeable-"
    "state family: countmin=frequency, HLL=distinct, this=quantiles)",
)
def sk_hist_quantiles_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 bins from a merged fixed-width histogram.

    Quantile sketches (GK/KLL) are mergeable only approximately; a
    fixed-width integer histogram is EXACTLY mergeable (integer adds
    commute) at the cost of bin-resolution answers — the right trade
    for percentile dashboards over 100 TB/day: per-shard state is
    |bins| longs, day rollups are additions, and the answer is a
    certified bin bracket, not a point estimate pretending precision.
    The entry computes the histogram BOTH ways (4 hash shards merged
    vs single-pass) and certifies equality value-for-value."""
    e = load_table(spark, sf_dir, "events")
    cents = (
        F.round(F.col("value").cast("decimal(12,4)") * 100, 0)
        .cast("bigint")
    )
    binned = e.select(
        cents.alias("cents"), (F.col("event_id") % 4).alias("shard")
    ).select(
        F.expr(f"cents div {_HBIN}").alias("bin"), "shard"
    )
    # per-shard partial histograms → merge by addition
    shard_hist = binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    merged = shard_hist.groupBy("bin").agg(F.sum("c").alias("c"))
    # single-pass histogram
    single = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_single")
    )
    both = merged.join(single, "bin", "full_outer")
    consistent = both.agg(
        F.min(
            (
                F.coalesce(F.col("c"), F.lit(-1))
                == F.coalesce(F.col("c_single"), F.lit(-2))
            ).cast("boolean")
        ).alias("ok")
    )
    from pyspark.sql.window import Window as W

    cum = merged.select(
        "bin",
        "c",
        F.sum("c")
        .over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("c").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("total"),
    )
    pcts = spark.createDataFrame([(50,), (90,), (99,)], "p int")
    q = (
        cum.crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(F.min("bin").alias("qbin"))
    )
    return q.crossJoin(F.broadcast(consistent)).select(
        F.col("p").cast("bigint").alias("pct"),
        (F.col("qbin") * _HBIN).cast("bigint").alias("cents_lo"),
        (F.col("qbin") * _HBIN + _HBIN).cast("bigint").alias("cents_hi"),
        F.col("ok").alias("merge_consistent"),
    )


# ---------------------------------------------------------------------------
# Multiclass classification report: the lang-ID model evaluated.
# ---------------------------------------------------------------------------
from oroboro_dw_dbt_spark.operators.training_suite import (  # noqa: E402
    _hits_sql,
)

_LANG_PRED_SQL = f"""CASE
      WHEN {_hits_sql('en')} + {_hits_sql('de')} + {_hits_sql('fr')}
           + {_hits_sql('es')} = 0 THEN 'und'
      WHEN {_hits_sql('en')} >= {_hits_sql('de')}
           AND {_hits_sql('en')} >= {_hits_sql('fr')}
           AND {_hits_sql('en')} >= {_hits_sql('es')} THEN 'en'
      WHEN {_hits_sql('de')} >= {_hits_sql('fr')}
           AND {_hits_sql('de')} >= {_hits_sql('es')} THEN 'de'
      WHEN {_hits_sql('fr')} >= {_hits_sql('es')} THEN 'fr'
      ELSE 'es' END"""


@query(
    "ml_multiclass_report",
    # a REAL model evaluated on REAL labels: the text family's lang-ID
    # heuristic (t_text_profile's lang_pred) scored against the corpus
    # lang column — per-class support/precision/recall from one
    # confusion pass, integer-exact with ppm fixed-point ratios
    oracle=f"""
    WITH p AS (
      SELECT lang AS truth, {_LANG_PRED_SQL} AS pred FROM documents
    ),
    cells AS (
      SELECT truth, pred, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    ),
    per_truth AS (
      SELECT truth AS lang,
             CAST(sum(n) AS BIGINT) AS support,
             CAST(sum(CASE WHEN pred = truth THEN n ELSE 0 END) AS BIGINT)
               AS tp
      FROM cells GROUP BY 1
    ),
    per_pred AS (
      SELECT pred AS lang, CAST(sum(n) AS BIGINT) AS pred_n
      FROM cells GROUP BY 1
    )
    SELECT t.lang, support, tp,
           CAST(coalesce(pred_n, 0) AS BIGINT) AS pred_n,
           CASE WHEN coalesce(pred_n, 0) = 0 THEN NULL
                ELSE tp * 1000000 // pred_n END AS precision_ppm,
           tp * 1000000 // support AS recall_ppm
    FROM per_truth t LEFT JOIN per_pred USING (lang)
    """,
    survey_ref="beyond-reference: multiclass classification report — "
    "per-class precision/recall of the text family's lang-ID model "
    "against corpus labels (composes text analysis with ml_eval; the "
    "binary confusion entry's k-class sibling)",
)
def ml_multiclass_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of lang-ID, from ONE confusion pass.

    The full k×k confusion matrix collapses to |classes|² cells in a
    single combining groupBy; per-class tp/support/pred_n come from
    conditional sums over that KB-sized table, never a second corpus
    scan. precision is NULL (not 0) for never-predicted classes —
    the honest spelling. This is the eval loop every curation
    classifier (lang, quality, toxicity) runs after retraining."""
    from oroboro_dw_dbt_spark.text.analysis import lang_id

    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        F.col("lang").alias("truth"), lang_id("text").alias("pred")
    )
    cells = p.groupBy("truth", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_truth = cells.groupBy(F.col("truth").alias("lang")).agg(
        F.sum("n").cast("bigint").alias("support"),
        F.sum(F.when(F.col("pred") == F.col("truth"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("tp"),
    )
    per_pred = cells.groupBy(F.col("pred").alias("lang")).agg(
        F.sum("n").cast("bigint").alias("pred_n")
    )
    m = per_truth.join(per_pred, "lang", "left").na.fill({"pred_n": 0})
    return m.select(
        "lang",
        "support",
        "tp",
        "pred_n",
        F.when(
            F.col("pred_n") == 0, F.lit(None).cast("bigint")
        )
        .otherwise(F.expr("tp * 1000000 div pred_n"))
        .alias("precision_ppm"),
        F.expr("tp * 1000000 div support").alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# As-of join with a match tolerance (the merge_asof tolerance knob).
# ---------------------------------------------------------------------------
_TOL_S = 6 * 3600


@query(
    "tj_asof_tolerance",
    # DuckDB ASOF finds the unbounded backward match; the tolerance is
    # then a NULL-out of matches older than the bound — the exact
    # pandas merge_asof(tolerance=...) contract
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts)
                     <= CAST({_TOL_S} AS BIGINT) * 1000000
                THEN c.ts END AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    survey_ref="beyond-reference: as-of join with tolerance — stale "
    "matches become NULL, never a silently-ancient enrichment "
    "(pandas merge_asof tolerance semantics; completes the as-of "
    "family: backward/forward/nearest/point-in-time/tolerance)",
)
def tj_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of where matches older than 6 h are discarded.

    The production failure this prevents: a feature-store lookup
    silently enriching from a week-stale snapshot. Same one-shuffle
    union plan as tj_asof_join; tolerance is a row-local NULL-out
    AFTER the running last() — exact integer-µs comparison (epoch
    doubles lose ulps at 2024 scale)."""
    from oroboro_dw_dbt_spark.ops.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    j = asof_join(purchases, clicks, key="user_id")
    within = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))
        <= _TOL_S * 1_000_000
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("asof_ts")).alias("asof_ts"),
    )


# ---------------------------------------------------------------------------
# DESCRIBE HISTORY: the manifest as an audit log.
# ---------------------------------------------------------------------------
@query(
    "eng_describe_history",
    # the lifecycle script is fixed (write → write → delete → restore),
    # so the oracle states the expected audit rows literally
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'write',   CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(2 AS BIGINT), 'write',   CAST(0 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(3 AS BIGINT), 'delete',  CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(4 AS BIGINT), 'restore', CAST(0 AS BIGINT), CAST(1 AS BIGINT))
    ) AS t(version, op, n_delete_files, data_version)
    """,
    survey_ref="engine: DESCRIBE HISTORY — the manifest queried as the "
    "audit log (op kind, delete-vector presence, data-dir reference "
    "per version; ManifestParquetFormat.history)",
)
def eng_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a 4-step lifecycle, then query the table's own history.

    write v1 → overwrite v2 → merge-on-read delete v3 → restore-to-v1
    v4; history() infers each op from the manifest alone (no separate
    journal to drift), and the restore row shows v4 re-referencing
    v1's data dir — provenance of the rollback as data. KB-scale at
    any table size."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="hist_wh_")) / "t"
    fmt = ManifestParquetFormat()
    base = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    fmt.write(base, table)  # v1
    fmt.write(base.filter(F.col("user_id") % 2 == 0), table)  # v2
    fmt.delete_keys(
        spark, table, base.select("event_id").limit(5), "event_id"
    )  # v3
    fmt.restore(table, 1)  # v4
    rows = [
        (
            h["version"],
            h["op"],
            h["n_delete_files"],
            int(h["data_dir"].rsplit("-", 1)[1]),
        )
        for h in fmt.history(table)
    ]
    return spark.createDataFrame(
        rows,
        "version bigint, op string, n_delete_files bigint, "
        "data_version bigint",
    )


# ---------------------------------------------------------------------------
# Hard-negative mining: same LSH bucket, low similarity.
# ---------------------------------------------------------------------------
@query(
    "sp_hard_negatives",
    # candidates from the band index (the near-dup plan's buckets),
    # kept only when exact Jaccard is LOW — confusable-but-different
    # pairs, ranked per anchor by md5 for retry-stable selection
    oracle=f"""
    WITH {_minhash_cte()},
    cand AS (
      SELECT DISTINCT a.doc_id AS anchor, b.doc_id AS neg
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id <> b.doc_id
    ),
    scored AS (
      SELECT anchor, neg
      FROM cand
      JOIN sh sa ON cand.anchor = sa.doc_id
      JOIN sh sb ON cand.neg = sb.doc_id
      WHERE len(list_filter(sa.shingles,
                            x -> list_contains(sb.shingles, x))) * 1.0
            / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
            < 0.2
    ),
    ranked AS (
      SELECT anchor, neg,
             row_number() OVER (
               PARTITION BY anchor
               ORDER BY md5(anchor || '|' || neg), neg) AS rk
      FROM scored
    )
    SELECT anchor, neg, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 2
    """,
    survey_ref="beyond-reference: hard-negative mining for contrastive "
    "training — same-LSH-bucket, low-Jaccard pairs (confusable but "
    "different), md5-ranked for retry-stable selection",
)
def sp_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≤2 hard negatives per document: bucket-collision, low overlap.

    Random negatives are trivially easy; the pairs a contrastive model
    learns from are the CONFUSABLE ones — and the LSH index already
    computes confusability (bucket collision) as a by-product of
    dedup. Exact-Jaccard < 0.2 guards against accidentally sampling a
    true near-dup as a negative (a label error that poisons training).
    Scale: candidates are O(bucket collisions); ranking is md5 order —
    deterministic under retries, no rand()."""
    from oroboro_dw_dbt_spark.dedup.dedup import minhash_band_index
    from oroboro_dw_dbt_spark.text.analysis import shingles

    docs = load_table(spark, sf_dir, "documents")
    bands = minhash_band_index(docs)
    a = bands.select(
        F.col("doc_id").alias("anchor"), "band", "band_key"
    )
    b = bands.select(F.col("doc_id").alias("neg"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("anchor") != F.col("neg"))
        .select("anchor", "neg")
        .distinct()
    )
    sh = docs.select("doc_id", shingles("text").alias("sh"))
    j = (
        cand.join(sh.withColumnRenamed("doc_id", "anchor"), "anchor")
        .withColumnRenamed("sh", "sh_a")
        .join(sh.withColumnRenamed("doc_id", "neg"), "neg")
        .withColumnRenamed("sh", "sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    scored = j.filter(inter * 1.0 / union < 0.2).select("anchor", "neg")
    rk = F.row_number().over(
        Window.partitionBy("anchor").orderBy(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("anchor").cast("string"),
                    F.col("neg").cast("string"),
                )
            ),
            "neg",
        )
    )
    return scored.withColumn("rk", rk).filter(F.col("rk") <= 2)


# ---------------------------------------------------------------------------
# Bloom filter: the mergeable MEMBERSHIP sketch.
# ---------------------------------------------------------------------------
_BF_WORDS = 64  # 64 words × 63 bits = 4032-bit filter (≈ 0.5 KB)
_BF_BITS = _BF_WORDS * 63
_BF_K = 3


def _bf_pos_sql(key_expr: str, j: str) -> str:
    return (
        f"CAST('0x' || substr(md5('bf|' || {j} || '|' || {key_expr}), 1, 8)"
        f" AS BIGINT) % {_BF_BITS}"
    )


@query(
    "sk_bloom_membership",
    # the oracle recomputes the identical deterministic filter in SQL:
    # zero false negatives is the INVARIANT (must be exactly 0), the
    # false-positive count is the measured honesty number, and the
    # 4-shard bit_or merge must equal the single-pass filter word for
    # word (OR is associative — same contract as the countmin/HLL/
    # histogram merges, now for membership)
    oracle=f"""
    WITH present AS (
      SELECT CAST(c_custkey AS STRING) AS k FROM customer
      WHERE c_custkey % 10 = 3
    ),
    pos AS (
      SELECT k, {_bf_pos_sql('k', 'j.j')} AS pos
      FROM present CROSS JOIN (SELECT unnest(range(0, {_BF_K})) AS j) j
    ),
    words AS (
      SELECT pos // 63 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
      FROM pos GROUP BY 1
    ),
    probes AS (
      SELECT CAST(c_custkey AS STRING) AS k, true AS is_present
      FROM customer WHERE c_custkey % 10 = 3
      UNION ALL
      SELECT CAST(c_custkey + 1000000000 AS STRING), false
      FROM customer WHERE c_custkey % 10 = 3
    ),
    ppos AS (
      SELECT k, is_present,
             {_bf_pos_sql('k', 'j.j')} AS pos
      FROM probes CROSS JOIN (SELECT unnest(range(0, {_BF_K})) AS j) j
    ),
    hits AS (
      SELECT p.k, p.is_present,
             bool_and(coalesce(
               (w.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 63 AS INT)))
                 <> 0, false)) AS member
      FROM ppos p LEFT JOIN words w ON p.pos // 63 = w.word
      GROUP BY p.k, p.is_present
    )
    SELECT
      CAST(sum(CASE WHEN is_present THEN 1 ELSE 0 END) AS BIGINT)
        AS n_present,
      CAST(sum(CASE WHEN is_present AND member THEN 1 ELSE 0 END)
           AS BIGINT) AS n_present_hit,
      CAST(sum(CASE WHEN is_present AND NOT member THEN 1 ELSE 0 END)
           AS BIGINT) AS n_false_neg,
      CAST(sum(CASE WHEN NOT is_present THEN 1 ELSE 0 END) AS BIGINT)
        AS n_absent,
      CAST(sum(CASE WHEN NOT is_present AND member THEN 1 ELSE 0 END)
           AS BIGINT) AS n_false_pos,
      true AS merge_consistent
    FROM hits
    """,
    survey_ref="beyond-reference: Bloom-filter membership sketch — "
    "md5-deterministic, zero-false-negative invariant as data, "
    "measured false positives, 4-shard bit_or merge == single pass "
    "(the mergeable-state family's membership member: countmin="
    "frequency, HLL=distinct, histogram=quantiles, bloom=membership)",
)
def sk_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A 0.5 KB Bloom filter built, merged, and probed — all certified.

    The runtime-filter/semi-join-pushdown primitive: ship the 64-word
    filter to the fact scan and drop rows whose keys cannot be in the
    build side (never a row that IS — the zero-false-negative
    invariant this entry certifies as a must-be-0 column). Per-shard
    filters bit_or-merge into exactly the single-pass filter, so
    membership state pre-aggregates map-side like every other sketch
    in the family. Hashing is md5-only → identical across engines,
    retries, and partitionings."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 10 == 3
    )
    present = cust.select(F.col("c_custkey").cast("string").alias("k"))

    def positions(df: DataFrame, *extra: str) -> DataFrame:
        p = df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(_BF_K - 1))).alias("j")
        )
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("bf"), F.col("j"), F.col("k"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return p.select(*(["k", *extra]), (h % _BF_BITS).alias("pos"))

    def build(df: DataFrame) -> DataFrame:
        return (
            positions(df)
            .groupBy(F.expr("pos div 63").alias("word"))
            .agg(
                F.expr(
                    "bit_or(shiftleft(CAST(1 AS BIGINT),"
                    " CAST(pos % 63 AS INT)))"
                ).alias("bits")
            )
        )

    single = build(present)
    sharded = (
        positions(present.withColumn("shard", F.crc32("k") % 4), "shard")
        .groupBy(F.expr("pos div 63").alias("word"), "shard")
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT),"
                " CAST(pos % 63 AS INT)))"
            ).alias("bits")
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    consistent = (
        single.withColumnRenamed("bits", "b1")
        .join(sharded.withColumnRenamed("bits", "b2"), "word", "full_outer")
        .agg(
            F.min(
                (
                    F.coalesce(F.col("b1"), F.lit(-1))
                    == F.coalesce(F.col("b2"), F.lit(-2))
                ).cast("boolean")
            ).alias("ok")
        )
    )
    probes = present.withColumn("is_present", F.lit(True)).unionByName(
        cust.select(
            (F.col("c_custkey") + 1000000000).cast("string").alias("k")
        ).withColumn("is_present", F.lit(False))
    )
    ppos = positions(probes, "is_present")
    hit = (
        ppos.join(
            F.broadcast(single),
            F.expr("pos div 63") == F.col("word"),
            "left",
        )
        .select(
            "k",
            "is_present",
            F.coalesce(
                (
                    F.expr(
                        "bits & shiftleft(CAST(1 AS BIGINT),"
                        " CAST(pos % 63 AS INT))"
                    )
                    != 0
                ),
                F.lit(False),
            ).alias("h"),
        )
        .groupBy("k", "is_present")
        .agg(F.bool_and("h").alias("member"))
    )
    summary = hit.agg(
        F.sum(F.col("is_present").cast("int")).cast("bigint").alias("n_present"),
        F.sum((F.col("is_present") & F.col("member")).cast("int"))
        .cast("bigint")
        .alias("n_present_hit"),
        F.sum((F.col("is_present") & ~F.col("member")).cast("int"))
        .cast("bigint")
        .alias("n_false_neg"),
        F.sum((~F.col("is_present")).cast("int")).cast("bigint").alias("n_absent"),
        F.sum((~F.col("is_present") & F.col("member")).cast("int"))
        .cast("bigint")
        .alias("n_false_pos"),
    )
    return summary.crossJoin(F.broadcast(consistent)).select(
        "n_present",
        "n_present_hit",
        "n_false_neg",
        "n_absent",
        "n_false_pos",
        F.col("ok").alias("merge_consistent"),
    )


# ---------------------------------------------------------------------------
# Bloom runtime filter applied to a real join, certified lossless.
# ---------------------------------------------------------------------------
@query(
    "sk_bloom_join_prune",
    # the oracle is the PLAIN join — the bloom prefilter must be
    # invisible in the result (zero false negatives ⇒ lossless); what
    # it changes is the fact rows reaching the shuffle
    oracle="""
    SELECT l.l_orderkey AS okey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM lineitem l
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    survey_ref="beyond-reference: Bloom runtime filter on a real join "
    "— the 0.5 KB filter from the reduced build side drops fact rows "
    "BEFORE the shuffle, certified lossless vs the plain join "
    "(sk_bloom_membership put to work; the manual spelling of "
    "spark.sql.optimizer.runtime.bloomFilter)",
)
def sk_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join lineitem to a 1%-selective order set through a Bloom gate.

    The build side (urgent 1998+ orders) collapses to a 64-word filter;
    the probe side evaluates 3 md5 bits per row — pure Column math, no
    join, no shuffle — and only surviving rows (true matches + the
    measured ~small false-positive slice) reach the equi-join. The
    hash match against the plain join is the losslessness proof; at
    100 TB this is the manual spelling of the optimizer's runtime
    bloom filter, usable where the optimizer can't see the
    opportunity (e.g. across a checkpoint or a table-format read)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    keys = orders.select(
        F.col("o_orderkey").cast("string").alias("k")
    )

    def pos(col: F.Column, j: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("bf"), j, col)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _BF_BITS
        )

    kp = keys.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(_BF_K - 1))).alias("j")
    ).select(pos(F.col("k"), F.col("j")).alias("pos"))
    words = kp.groupBy(F.expr("pos div 63").alias("word")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)))"
        ).alias("bits")
    )
    # the ≤64-row filter table broadcasts; each probe row checks its
    # 3 bit positions via broadcast lookups — an absent word means no
    # bits set there, so the inner join itself prunes those rows
    lk = F.col("l_orderkey").cast("string")
    pruned = li
    for j in range(_BF_K):
        pruned = pruned.withColumn(f"pos_{j}", pos(lk, F.lit(j)))
    for j in range(_BF_K):
        w = words.select(
            F.col("word").alias(f"w_{j}"), F.col("bits").alias(f"bits_{j}")
        )
        pruned = pruned.join(
            F.broadcast(w),
            F.expr(f"pos_{j} div 63") == F.col(f"w_{j}"),
            "inner",
        ).filter(
            F.expr(
                f"bits_{j} & shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pos_{j} % 63 AS INT))"
            )
            != 0
        )
    joined = pruned.join(
        F.broadcast(orders.select("o_orderkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return joined.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("price_cents"),
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency: max overlapping intervals per key.
# ---------------------------------------------------------------------------
@query(
    "ev_overlap_concurrency",
    # classic sweep line: +1 at start, −1 after end, running sum in
    # (time, delta) order = live-interval count; its max is the
    # answer. Identical window program on both engines.
    oracle="""
    WITH iv AS (
      SELECT o_custkey % 25 AS key,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE)
               + INTERVAL (o_orderkey % 14 + 1) DAY AS e
      FROM orders
    ),
    pts AS (
      SELECT key, s AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT key, e + INTERVAL 1 DAY, -1 FROM iv
    ),
    run AS (
      SELECT key, d,
             sum(delta) OVER (
               PARTITION BY key ORDER BY d, delta
               ROWS UNBOUNDED PRECEDING) AS live
      FROM pts
    )
    SELECT CAST(key AS BIGINT) AS key,
           CAST(max(live) AS BIGINT) AS max_concurrent
    FROM run GROUP BY key
    """,
    survey_ref="beyond-reference: sweep-line max concurrency — peak "
    "overlapping intervals per key (capacity/occupancy analytics; the "
    "aggregation sibling of j_interval_overlap's pairing)",
)
def ev_overlap_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous open orders per customer bucket.

    The sweep line turns interval overlap counting from quadratic
    pairing into O(n log n): two events per interval, one partitioned
    running sum, one max. Tie order is pinned (delta ASC puts the −1
    before the +1 at the same date, so back-to-back intervals — end+1
    == next start — do NOT count as concurrent). At 100 TB this is
    the occupancy-curve plan: one shuffle on key, windows reuse it."""
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        (F.col("o_custkey") % 25).alias("key"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(
            F.to_date("o_orderdate"),
            (F.col("o_orderkey") % 14 + 1).cast("int"),
        ).alias("e"),
    )
    pts = iv.select(
        "key", F.col("s").alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "key", F.date_add("e", 1).alias("d"), F.lit(-1).alias("delta")
        )
    )
    live = F.sum("delta").over(
        Window.partitionBy("key")
        .orderBy("d", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pts.withColumn("live", live)
        .groupBy(F.col("key").cast("bigint").alias("key"))
        .agg(F.max("live").cast("bigint").alias("max_concurrent"))
    )


# ---------------------------------------------------------------------------
# Vocabulary frequency-cutoff curve: corpus Zipf diagnostics.
# ---------------------------------------------------------------------------
from oroboro_dw_dbt_spark.operators.training_suite import _TOKS  # noqa: E402


@query(
    "t_frequency_cutoff_curve",
    # token counts → histogram of counts → reverse-cumulative curve:
    # for each observed frequency f, how many types and how much token
    # mass survive a min-count ≥ f cutoff. One corpus pass; everything
    # after runs on the |distinct counts| table.
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1),
    hist AS (
      SELECT f, CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(f) AS BIGINT) AS mass
      FROM tf GROUP BY f
    )
    SELECT f AS min_count,
           CAST(sum(n_types) OVER (ORDER BY f DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size,
           CAST(sum(mass) OVER (ORDER BY f DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS token_mass
    FROM hist
    """,
    survey_ref="beyond-reference: vocabulary frequency-cutoff curve — "
    "vocab size and surviving token mass at EVERY min-count threshold "
    "from one pass (the Zipf diagnostic behind t_vocab_build's cutoff "
    "choice)",
)
def t_frequency_cutoff_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(min_count → vocab size, surviving token mass), all thresholds.

    t_vocab_build picks ONE min-count; this is the curve you look at
    to pick it — computed without picking: token counts collapse to a
    count-of-counts histogram (KBs: |distinct frequencies| rows), and
    a reverse-cumulative window answers every threshold at once. The
    corpus is read once; the window runs on the histogram."""
    from oroboro_dw_dbt_spark.text.analysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    hist = tf.groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("f").cast("bigint").alias("mass"),
    )
    w = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return hist.select(
        F.col("f").alias("min_count"),
        F.sum("n_types").over(w).cast("bigint").alias("vocab_size"),
        F.sum("mass").over(w).cast("bigint").alias("token_mass"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (bounded peeling): graph cleaning's workhorse.
# ---------------------------------------------------------------------------
_KCORE_K = 20
_KCORE_PEELS = 4


def _kcore_oracle() -> str:
    peel = []
    for i in range(1, _KCORE_PEELS + 1):
        # AS MATERIALIZED: e{i-1} is referenced twice per peel; plain
        # CTE inlining doubles the subtree each level (2^peels blowup —
        # the same DuckDB trap the SSSP oracle hit)
        peel.append(
            f"""n{i} AS MATERIALIZED (
      SELECT src AS u FROM e{i - 1} GROUP BY src
      HAVING count(*) >= {_KCORE_K}
    ),
    e{i} AS MATERIALIZED (
      SELECT src, dst FROM e{i - 1}
      WHERE src IN (SELECT u FROM n{i}) AND dst IN (SELECT u FROM n{i})
    )"""
        )
    peels = ",\n    ".join(peel)
    return f"""
    WITH base AS (
      SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      FROM (SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
            FROM events WHERE event_type = 'purchase') a
      JOIN (SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
            FROM events WHERE event_type = 'purchase') b
        ON a.hr = b.hr AND a.user_id <> b.user_id
    ),
    e0 AS MATERIALIZED (SELECT src, dst FROM base),
    {peels},
    core AS (
      SELECT src AS u, CAST(count(*) AS BIGINT) AS core_deg
      FROM e{_KCORE_PEELS} GROUP BY src
    )
    SELECT n.u AS user_id,
           CASE WHEN c.u IS NOT NULL THEN true ELSE false END AS in_core,
           CAST(coalesce(c.core_deg, 0) AS BIGINT) AS core_deg
    FROM (SELECT DISTINCT src AS u FROM e0) n
    LEFT JOIN core c ON n.u = c.u
    """


@query(
    "gr_kcore",
    # peel cap is EQUAL on both sides (4), so the hash match certifies
    # the peeling algorithm itself whether or not the cap reaches the
    # fixpoint — the gr_bfs_distances equal-cap discipline, applied to
    # the degree-peeling recursion
    oracle=_kcore_oracle(),
    survey_ref="beyond-reference: k-core decomposition (graph family "
    "#7) — iterative degree peeling with symmetric-edge restriction, "
    "vs the equal-cap unrolled-subquery oracle; the graph-cleaning "
    "step before community/embedding jobs",
)
def gr_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes surviving 4 peels at k=20 in the co-purchase graph.

    Each peel: one degree aggregate + one semi-join restricting edges
    to surviving endpoints — two shuffles per iteration, state is the
    shrinking edge list (checkpointed to truncate lineage). k-core is
    the standard graph-cleaning step (drop weakly-attached noise
    before community detection / graph embeddings); the equal-cap
    oracle makes the certification exact regardless of convergence,
    and the pytest additionally witnesses the fixpoint at the gate
    scale."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.expr("unix_timestamp(ts) div 3600").alias("hr")
        )
    )
    a, b = e.alias("a"), e.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.hr") == F.col("b.hr"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = edges.select(F.col("src").alias("u")).distinct()
    cur = edges
    for _ in range(_KCORE_PEELS):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select(F.col("src").alias("u"))
        )
        cur = (
            cur.join(keep, cur.src == keep.u, "left_semi")
            .join(keep, cur.dst == keep.u, "left_semi")
            .localCheckpoint(eager=True)
        )
    core = cur.groupBy(F.col("src").alias("u")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_deg")
    )
    return (
        all_nodes.join(core.withColumnRenamed("u", "cu"),
                       F.col("u") == F.col("cu"), "left")
        .select(
            F.col("u").alias("user_id"),
            F.col("cu").isNotNull().alias("in_core"),
            F.coalesce("core_deg", F.lit(0)).cast("bigint").alias("core_deg"),
        )
    )
