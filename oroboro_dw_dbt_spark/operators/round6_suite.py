"""Round-6 breadth entries: weighted shortest paths (the sixth graph
algorithm), window distribution functions, the regex surface, RFM
segmentation, and time-series linear interpolation.

Every entry follows the house rules (operators/catalog.py docstring):
identical aliases on both sides, explicit tiebreaks in every window,
integer or integer-derived arithmetic wherever a float could diverge
between engines (see memory: floor-div and HALF_UP divergences have
broken hashes before — interpolation below is exact-integer-in-double
for that reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.analytics_suite import (
    _TRADE_PAIRS_SQL,
    _trade_pairs,
)
from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Weighted single-source shortest paths on the nation trade graph.
# ---------------------------------------------------------------------------
_SSSP_ROUNDS = 6  # ≥ the trade graph's diameter (25 dense nodes)

_SSSP_EDGES_SQL = f"""WITH {_TRADE_PAIRS_SQL}
      SELECT a AS src, b AS dst,
             CAST(1 + (a * 3 + b * 5) %% 9 AS BIGINT) AS w FROM pairs
      UNION ALL
      SELECT b, a, CAST(1 + (a * 3 + b * 5) %% 9 AS BIGINT) FROM pairs"""


def _sssp_oracle() -> str:
    from oroboro_dw_dbt_spark.ops.graph import sssp_oracle_sql

    return sssp_oracle_sql(
        _SSSP_EDGES_SQL.replace("%%", "%"), source=0, rounds=_SSSP_ROUNDS
    )


@query(
    "gr_sssp_weighted",
    # unrolled Bellman-Ford twin: one CTE per relaxation round, the
    # same NULL-as-infinity CASE min — both engines walk the identical
    # integer trajectory (ops/graph.py sssp_oracle_sql)
    oracle=_sssp_oracle(),
    survey_ref="beyond-reference: weighted single-source shortest paths "
    "(bounded Bellman-Ford; driver-owned relaxation loop — the third "
    "iterative-state shape after components and PageRank)",
)
def gr_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest weighted distance from nation 0 over the 1996-01 trade
    graph; edge weight is a key-derived positive integer so the
    certified surface is the ALGORITHM (relaxation, NULL-infinity min,
    fixed rounds), not a weight-collection pipeline the other graph
    entries already certify. Unreached nodes stay NULL.

    Scale: each round is one edges⋈dist shuffle + one groupBy(dst) min
    — a pagerank-iteration twin; bounded rounds mean no per-round
    driver convergence barrier (see ops/graph.py scale notes)."""
    from oroboro_dw_dbt_spark.ops.graph import sssp

    pairs = _trade_pairs(spark, sf_dir)
    w = (F.lit(1) + (F.col("a") * 3 + F.col("b") * 5) % 9).cast("bigint")
    fwd = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"), w.alias("w"))
    rev = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), w.alias("w"))
    return sssp(fwd.unionByName(rev), source=0, rounds=_SSSP_ROUNDS)


# ---------------------------------------------------------------------------
# Window distribution functions: percent_rank / cume_dist / dense_rank /
# ntile in one partitioning.
# ---------------------------------------------------------------------------
@query(
    "w_dist_suite",
    # rank-family functions are deterministic under ties (value-based);
    # ntile depends on ROW order so its window pins a unique composite
    # ORDER BY. Both windows share the l_returnflag partitioning → ONE
    # exchange feeds both sorts.
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             CAST(round(percent_rank() OVER vq, 6) AS DOUBLE) AS pct_rank,
             CAST(round(cume_dist() OVER vq, 6) AS DOUBLE) AS cume,
             CAST(dense_rank() OVER vq AS BIGINT) AS dense_rk,
             CAST(ntile(10) OVER vu AS INT) AS decile
      FROM lineitem
      WINDOW vq AS (PARTITION BY l_returnflag ORDER BY l_quantity),
             vu AS (PARTITION BY l_returnflag
                    ORDER BY l_quantity, l_orderkey, l_linenumber)
    )
    SELECT * FROM ranked WHERE l_orderkey % 97 = 0
    """,
    survey_ref="beyond-reference: window distribution-function surface "
    "(percent_rank, cume_dist, dense_rank, ntile) — completes the "
    "window family (W1–W4, w_rank_suite, w_ntile_distribution)",
)
def w_dist_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    vu = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            F.round(F.percent_rank().over(vq), 6).cast("double").alias("pct_rank"),
            F.round(F.cume_dist().over(vq), 6).cast("double").alias("cume"),
            F.dense_rank().over(vq).cast("bigint").alias("dense_rk"),
            F.ntile(10).over(vu).cast("int").alias("decile"),
        )
        .filter(F.col("l_orderkey") % 97 == 0)
    )


# ---------------------------------------------------------------------------
# Regex surface over documents.
# ---------------------------------------------------------------------------
@query(
    "f_regex_suite",
    # patterns are RE2-and-Java-common (character classes, literals,
    # unanchored find); DuckDB needs the explicit 'g' flag where Spark's
    # regexp_replace is always global
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '[a-z]*ck[a-z]*') AS first_ck_word,
           CAST(len(regexp_extract_all(text, 'spark')) AS INT) AS n_spark,
           regexp_replace(substr(text, 1, 60), '[aeiou]+', '_', 'g')
             AS devoweled_head,
           regexp_matches(text, 'query [a-z]+ join') AS has_query_x_join
    FROM documents
    """,
    survey_ref="beyond-reference: regex function surface (extract, "
    "count, global replace, boolean match) — row-local Column ops, "
    "zero shuffle, shared RE2/Java-safe pattern subset",
)
def f_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]*ck[a-z]*", 0).alias("first_ck_word"),
        F.regexp_count("text", F.lit("spark")).cast("int").alias("n_spark"),
        F.regexp_replace(F.substring("text", 1, 60), "[aeiou]+", "_").alias(
            "devoweled_head"
        ),
        F.col("text").rlike("query [a-z]+ join").alias("has_query_x_join"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation over the events stream.
# ---------------------------------------------------------------------------
@query(
    "ev_rfm_segments",
    # quartiles via ntile over a pinned total order (metric, user_id);
    # monetary is DECIMAL-summed then rounded once, so both engines
    # bucket identical values identically
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             date_diff('day', CAST(max(ts) AS DATE),
                       (SELECT CAST(max(ts) AS DATE) FROM events))
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(recency_days AS INT) AS recency_days,
           frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS INT) AS r_q,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_q,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_q
    FROM per_user
    """,
    survey_ref="beyond-reference: RFM user segmentation (recency/"
    "frequency/monetary quartiles) — the canonical marts-layer scoring "
    "shape over the events fact",
)
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM with quartile scores.

    Scale note: the three ntile windows are GLOBAL (single-partition
    sort of the per-user aggregate). That is the right call while
    |users| ≪ |events| — the window input is already reduced ~1000× by
    the groupBy — but at billions of users the certified substitute is
    the two-phase range-partitioned ranking of `w_rank_twophase`
    (operators/extended_suite.py), which computes identical quartiles
    with no single-task sort."""
    ev = load_table(spark, sf_dir, "events")
    gmax = ev.agg(F.max(F.col("ts").cast("date")).alias("gmax"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("umax"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff("gmax", "umax").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "user_id"))
        .cast("int")
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "user_id"))
        .cast("int")
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "user_id"))
        .cast("int")
        .alias("m_q"),
    )


# ---------------------------------------------------------------------------
# Time-series linear interpolation over the hourly grid.
# ---------------------------------------------------------------------------
@query(
    "ts_interpolate",
    # prev/next non-null neighbors are found WITHOUT `IGNORE NULLS` (its
    # availability/semantics vary): hour and cents are packed into one
    # BIGINT (epoch_hour * 100000 + cents, cents < 100000) whose
    # running max/min over the frame is monotone in hour — an
    # engine-portable argmax. Interpolation is exact-integer-in-double:
    # one IEEE division, no rounding, identical bits on both engines.
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(round(max(CAST(value AS DECIMAL(12,4))) * 100, 0) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(hour) AS hmin, max(hour) AS hmax
      FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(hmin, hmax,
                                             INTERVAL 1 HOUR)) AS hour
      FROM spans
    ),
    joined AS (
      SELECT g.user_id, g.hour, h.cents,
             CAST(epoch(g.hour) AS BIGINT) // 3600 AS eh
      FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    ),
    packed AS (
      SELECT *,
             max(CASE WHEN cents IS NOT NULL THEN eh * 100000 + cents END)
               OVER (PARTITION BY user_id ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_p,
             min(CASE WHEN cents IS NOT NULL THEN eh * 100000 + cents END)
               OVER (PARTITION BY user_id ORDER BY hour
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_p
      FROM joined
    )
    SELECT user_id, hour, cents IS NOT NULL AS observed,
           CAST(CASE
             WHEN cents IS NOT NULL THEN cents / 100.0
             WHEN prev_p IS NULL OR next_p IS NULL THEN NULL
             ELSE (prev_p % 100000
                   + (next_p % 100000 - prev_p % 100000)
                     * (eh - prev_p // 100000)
                     / (next_p // 100000 - prev_p // 100000)) / 100.0
           END AS DOUBLE) AS value_interp
    FROM packed
    """,
    survey_ref="beyond-reference: time-series linear interpolation on "
    "the hourly grid (gap fill's twin: ts_gap_fill forward-fills, this "
    "interpolates between the surrounding observations)",
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of each user's missing hourly values.

    SEGMENT-EXPLODE formulation (round-6 rewrite, hash-identical to the
    certified packed-argmax spelling the oracle still uses): one lead()
    window over the OBSERVED hourly rows pairs each observation with
    its successor, and exploding the [h, next−1h] range emits that
    segment's grid rows with both endpoints already in hand. Compared
    to the grid⋈hourly + two running-window plan this drops the join
    and the second (30×-larger) sort: the noop-sink wall at sf0.1 fell
    6.6 s → ~2 s. Physical shape (plan-asserted): ONE user_id exchange,
    ONE sort — over observed rows only, never the exploded grid.
    Interpolation arithmetic is exact-integer-in-double (one IEEE
    division), bit-identical across engines; NULL beyond the first/last
    observation (no extrapolation — inside the span both endpoints
    exist by construction).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h0")
    ).agg(
        F.round(F.max(F.col("value").cast("decimal(12,4)")) * 100, 0)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("h0")
    seg = hourly.select(
        "user_id",
        "h0",
        "cents",
        F.lead("h0").over(w).alias("h1"),
        F.lead("cents").over(w).alias("c1"),
    )
    # each observation owns the grid range [h0, h1 − 1h] (the last one
    # owns just itself) — together: every hour in [first, last], once
    grid = seg.select(
        "user_id",
        "h0",
        "cents",
        "c1",
        (F.col("h0").cast("bigint") / 3600).cast("bigint").alias("eh0"),
        (F.col("h1").cast("bigint") / 3600).cast("bigint").alias("eh1"),
        F.explode(
            F.sequence(
                "h0",
                F.coalesce(F.expr("h1 - INTERVAL 1 HOUR"), F.col("h0")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    ).withColumn("eh", (F.col("hour").cast("bigint") / 3600).cast("bigint"))
    observed = F.col("hour") == F.col("h0")
    return grid.select(
        "user_id",
        "hour",
        observed.alias("observed"),
        F.when(observed, F.col("cents") / 100.0)
        .otherwise(
            (
                F.col("cents")
                + (F.col("c1") - F.col("cents"))
                * (F.col("eh") - F.col("eh0"))
                / (F.col("eh1") - F.col("eh0"))
            )
            / 100.0
        )
        .cast("double")
        .alias("value_interp"),
    )


# ---------------------------------------------------------------------------
# Multimodal resize: block-average downsample of the binary payload.
# ---------------------------------------------------------------------------
@query(
    "mm_resize_blocks",
    # ASCII corpus ⇒ byte arithmetic over the payload equals char-code
    # arithmetic over text, so the oracle restates the exact floor
    # boundaries and integer means (all operands non-negative, so
    # DuckDB's floor-div // and numpy's // agree)
    oracle="""
    WITH b AS (SELECT doc_id, length(text) AS n, text FROM documents)
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           array_to_string(list_transform(range(0, 16), k ->
             printf('%02x', CAST(
               list_sum(list_transform(
                 range((k * n) // 16 + 1, ((k + 1) * n) // 16 + 1),
                 i -> ascii(substr(text, CAST(i AS INT), 1))))
               // greatest(((k + 1) * n) // 16 - (k * n) // 16, 1)
             AS BIGINT))), '') AS resized_hex
    FROM b
    """,
    survey_ref="beyond-reference: multimodal resize (block-average "
    "downsample over binary payloads; vectorized numpy kernel through "
    "the decode_media mapInPandas seam — PIL's BOX resize drop-in)",
)
def mm_resize_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.multimodal import media_from_documents
    from oroboro_dw_dbt_spark.multimodal.media import resize_blocks

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return resize_blocks(media)
