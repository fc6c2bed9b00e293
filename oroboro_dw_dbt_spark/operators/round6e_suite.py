"""Round-6 ninth wave: lift/gains, position-based attribution, and
the mergeable top-k summary.

- ``ml_lift_gains`` — decile lift & cumulative-gains table over the
  ml-eval family's deterministic synthetic scores: the model-triage
  artifact (who to target first) that AUC/PR entries don't expose.
  Ranking is ntile(10) with a pinned (score DESC, vec_id) tie-break;
  every statistic derives from BIGINT counts.
- ``ev_attribution_credit`` — U-shaped (40/20/40) position-based
  multi-touch attribution: each purchase credits the view/click
  touches in its 3-day lookback — 40% first touch, 40% last, 20%
  split across middles — entirely via RANGE-frame window aggregates
  with packed-BIGINT argmin/argmax (the ev_sequence_match idiom), no
  touch×conversion join. Credits are micro fixed-point BEFORE the
  cross-purchase sum (order-independent).
- ``sk_topk_mergeable`` — the mergeable top-k summary (Agarwal et al.
  2012, "Mergeable Summaries"): each of 4 row-shards keeps its local
  top-20 (count DESC, key) plus its k-th count as the absent-key
  threshold; merged estimates carry [est_lower, est_upper] bounds.
  The entry certifies the bound contract — for every exact global
  top-10 key, est_lower ≤ exact ≤ est_upper as a must-be-1 column —
  completing the mergeable-state family (countmin=frequency,
  HLL=distinct, histogram=quantiles, Bloom=membership, this=top-k).

House rules (operators/catalog.py): exact integers until a final
scalar expression, identical aliases both engines, explicit
tie-breaks. The reference (3 BigQuery models) has no analog; SURVEY
§6 scopes these families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.operators.ml_eval_suite import _binary_scores
from oroboro_dw_dbt_spark.sources.testdata import load_table

_ORIGIN_S = 1704067200
_LOOKBACK_S = 3 * 86400
_PACK_EV = 1 << 24  # off_s (<2^22) * 2^24 + event_id*2 + tcode stays < 2^47
_TOPK_SHARDS = 4
_TOPK_K = 20
_TOPK_OUT = 10


@query(
    "ml_lift_gains",
    oracle="""
    WITH s AS (
      SELECT vec_id, label % 2 AS y,
             ((vec_id * 2654435761 + 40503) % 100000) % 600
               + (label % 2) * 400 AS sx
      FROM embeddings
    ),
    d AS (
      SELECT y, ntile(10) OVER (ORDER BY sx DESC, vec_id) AS decile FROM s
    ),
    agg AS (
      SELECT CAST(decile AS INT) AS decile,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      FROM d GROUP BY decile
    ),
    cum AS (
      SELECT decile, n, pos,
             CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
             CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
             CAST(sum(n) OVER () AS BIGINT) AS tot_n,
             CAST(sum(pos) OVER () AS BIGINT) AS tot_pos
      FROM agg
    )
    SELECT decile, n, pos, cum_pos,
           CAST(round(CAST(cum_pos AS DOUBLE) / tot_pos * 1e6, 0) AS BIGINT)
             AS gains_micro,
           CAST(round(CAST(cum_pos * tot_n AS DOUBLE) / (cum_n * tot_pos) * 1e6, 0)
             AS BIGINT) AS lift_micro
    FROM cum
    """,
    survey_ref="beyond-reference: decile lift & cumulative gains — the "
    "model-triage table; pinned ntile tie-break, BIGINT statistics",
)
def ml_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains over the synthetic binary scores.

    Scale: ntile is rank-based, so this entry is the exact-ranking
    shape; at 100 TB the two-phase range-partition ranking
    (w_rank_twophase) substitutes for the single-partition window with
    identical output — or the histogram route (ml_* family) replaces
    deciles with score-bucket bins at zero ordered work."""
    s = _binary_scores(spark, sf_dir)
    d = s.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("sx"), "vec_id"))
    )
    agg = d.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = agg.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wt).alias("tot_n"),
        F.sum("pos").over(wt).alias("tot_pos"),
    )
    return cum.select(
        "decile",
        "n",
        "pos",
        "cum_pos",
        F.round(F.col("cum_pos").cast("double") / F.col("tot_pos") * 1e6, 0)
        .cast("long")
        .alias("gains_micro"),
        F.round(
            (F.col("cum_pos") * F.col("tot_n")).cast("double")
            / (F.col("cum_n") * F.col("tot_pos"))
            * 1e6,
            0,
        )
        .cast("long")
        .alias("lift_micro"),
    )


@query(
    "ev_attribution_credit",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) - {_ORIGIN_S} AS off_s
      FROM events
    ),
    fr AS (
      SELECT *,
             count(CASE WHEN event_type IN ('view', 'click') THEN 1 END) OVER w
               AS n_t,
             count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_v,
             min(CASE WHEN event_type IN ('view', 'click')
                 THEN off_s * {_PACK_EV} + event_id * 2
                      + CAST(event_type = 'click' AS BIGINT) END) OVER w
               AS first_pack,
             max(CASE WHEN event_type IN ('view', 'click')
                 THEN off_s * {_PACK_EV} + event_id * 2
                      + CAST(event_type = 'click' AS BIGINT) END) OVER w
               AS last_pack
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY off_s
                   RANGE BETWEEN {_LOOKBACK_S} PRECEDING AND 1 PRECEDING)
    ),
    conv AS (
      SELECT n_t, n_v, n_t - n_v AS n_c,
             CAST(first_pack % 2 = 0 AS BIGINT) AS f_v,
             CAST(last_pack % 2 = 0 AS BIGINT) AS l_v
      FROM fr WHERE event_type = 'purchase' AND n_t > 0
    ),
    credit AS (
      SELECT
        CASE WHEN n_t = 1 THEN 1000000 * f_v
             WHEN n_t = 2 THEN 500000 * f_v + 500000 * l_v
             ELSE CAST(round(400000 * f_v + 400000 * l_v
                  + 200000.0 * (n_v - f_v - l_v) / (n_t - 2), 0) AS BIGINT)
        END AS c_view,
        CASE WHEN n_t = 1 THEN 1000000 * (1 - f_v)
             WHEN n_t = 2 THEN 500000 * (1 - f_v) + 500000 * (1 - l_v)
             ELSE CAST(round(400000 * (1 - f_v) + 400000 * (1 - l_v)
                  + 200000.0 * (n_c - (1 - f_v) - (1 - l_v)) / (n_t - 2), 0)
                  AS BIGINT)
        END AS c_click
      FROM conv
    )
    SELECT 'view' AS touch_type,
           CAST(count(CASE WHEN c_view > 0 THEN 1 END) AS BIGINT) AS conversions,
           CAST(sum(c_view) AS BIGINT) AS credit_micro
    FROM credit
    UNION ALL
    SELECT 'click', CAST(count(CASE WHEN c_click > 0 THEN 1 END) AS BIGINT),
           CAST(sum(c_click) AS BIGINT)
    FROM credit
    """,
    survey_ref="beyond-reference: U-shaped (40/20/40) multi-touch "
    "attribution via RANGE-frame packed argmin/argmax — no "
    "touch×conversion join",
)
def ev_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based attribution credit per touch type.

    Each purchase reads its 3-day touch window through FOUR frame
    aggregates over ONE (user_id, off_s) sort — count, view-count, and
    packed argmin/argmax (off·2²⁴ + event_id·2 + is_click, unique per
    event, so ties at the same second stay deterministic). Per-purchase
    credits round to micro fixed-point BEFORE the global sum, keeping
    the cross-purchase aggregation an integer sum. Scale: identical to
    the sessionized-funnel plan — one shuffle on user_id, value-bounded
    frame state, no self-join."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_timestamp("ts") - _ORIGIN_S).alias("off_s"),
    )
    is_touch = F.col("event_type").isin("view", "click")
    pack = F.when(
        is_touch,
        F.col("off_s") * _PACK_EV
        + F.col("event_id") * 2
        + (F.col("event_type") == "click").cast("long"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("off_s")
        .rangeBetween(-_LOOKBACK_S, -1)
    )
    fr = e.select(
        "event_type",
        F.count(F.when(is_touch, F.lit(1))).over(w).alias("n_t"),
        F.count(F.when(F.col("event_type") == "view", F.lit(1)))
        .over(w)
        .alias("n_v"),
        F.min(pack).over(w).alias("first_pack"),
        F.max(pack).over(w).alias("last_pack"),
    )
    conv = fr.where((F.col("event_type") == "purchase") & (F.col("n_t") > 0)).select(
        "n_t",
        "n_v",
        (F.col("n_t") - F.col("n_v")).alias("n_c"),
        (F.col("first_pack") % 2 == 0).cast("long").alias("f_v"),
        (F.col("last_pack") % 2 == 0).cast("long").alias("l_v"),
    )

    def credit(nty, first, last):
        mid = nty - first - last
        return (
            F.when(F.col("n_t") == 1, 1000000 * first)
            .when(F.col("n_t") == 2, 500000 * first + 500000 * last)
            .otherwise(
                F.round(
                    400000 * first
                    + 400000 * last
                    + 200000.0 * mid / (F.col("n_t") - 2),
                    0,
                ).cast("long")
            )
        )

    one = F.lit(1)
    cr = conv.select(
        credit(F.col("n_v"), F.col("f_v"), F.col("l_v")).alias("c_view"),
        credit(
            F.col("n_c"), one - F.col("f_v"), one - F.col("l_v")
        ).alias("c_click"),
    )
    out = cr.agg(
        F.count(F.when(F.col("c_view") > 0, F.lit(1))).alias("conv_v"),
        F.sum("c_view").alias("cred_v"),
        F.count(F.when(F.col("c_click") > 0, F.lit(1))).alias("conv_c"),
        F.sum("c_click").alias("cred_c"),
    )
    return out.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("touch_type"),
                    F.col("conv_v").alias("conversions"),
                    F.col("cred_v").alias("credit_micro"),
                ),
                F.struct(
                    F.lit("click").alias("touch_type"),
                    F.col("conv_c").alias("conversions"),
                    F.col("cred_c").alias("credit_micro"),
                ),
            )
        ).alias("r")
    ).select("r.touch_type", "r.conversions", "r.credit_micro")


@query(
    "sk_topk_mergeable",
    oracle=f"""
    WITH sharded AS (
      SELECT user_id,
             CAST('0x' || substr(md5('tk1|' || CAST(event_id AS VARCHAR)), 1, 2)
                  AS INTEGER) % {_TOPK_SHARDS} AS shard
      FROM events
    ),
    sc AS (
      SELECT shard, user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM sharded GROUP BY shard, user_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY shard
                                   ORDER BY cnt DESC, user_id) AS rk
      FROM sc
    ),
    kept AS (SELECT shard, user_id, cnt FROM ranked WHERE rk <= {_TOPK_K}),
    thr AS (SELECT shard, CAST(min(cnt) AS BIGINT) AS thr FROM kept GROUP BY shard),
    tot_thr AS (SELECT CAST(sum(thr) AS BIGINT) AS all_thr FROM thr),
    est AS (
      SELECT user_id, CAST(sum(cnt) AS BIGINT) AS est_lower,
             CAST(sum(cnt) + (SELECT all_thr FROM tot_thr)
                  - sum(t.thr) AS BIGINT) AS est_upper
      FROM kept k JOIN thr t ON t.shard = k.shard
      GROUP BY user_id
    ),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM sharded GROUP BY user_id
    ),
    top10 AS (
      SELECT user_id, exact_cnt,
             row_number() OVER (ORDER BY exact_cnt DESC, user_id) AS rnk
      FROM exact
    )
    SELECT t.user_id, t.exact_cnt, CAST(t.rnk AS INT) AS rnk,
           e.est_lower, e.est_upper,
           CAST(e.user_id IS NOT NULL AS INT) AS in_candidates,
           CAST(e.user_id IS NULL
                OR (e.est_lower <= t.exact_cnt AND t.exact_cnt <= e.est_upper)
                AS INT) AS bound_ok
    FROM top10 t LEFT JOIN est e ON e.user_id = t.user_id
    WHERE t.rnk <= {_TOPK_OUT}
    """,
    survey_ref="beyond-reference: mergeable top-k summary (per-shard "
    "top-K + k-th-count threshold, merged with [lower, upper] bounds) — "
    "bound contract certified as a must-be-1 column",
)
def sk_topk_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged 4-shard top-k summary vs exact global top-10.

    The summary each shard keeps is K rows + one threshold — fixed
    size, mergeable by addition, the pre-aggregation contract for
    heavy-hitters at 100 TB (per-executor summaries merge on one
    reducer instead of shuffling every key). ``bound_ok`` certifies
    the estimate interval contains the exact count for every exact
    top-10 key present in the merged candidates; ``in_candidates``
    reports coverage (guaranteed only when K is large enough relative
    to the skew — uniform keys here make it a diagnostic, not an
    invariant)."""
    e = load_table(spark, sf_dir, "events")
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("tk1|"), F.col("event_id").cast("string"))), 1, 2),
            16,
            10,
        ).cast("int")
        % _TOPK_SHARDS
    )
    sharded = e.select("user_id", shard.alias("shard"))
    sc = sharded.groupBy("shard", "user_id").agg(F.count("*").alias("cnt"))
    rk = F.row_number().over(
        Window.partitionBy("shard").orderBy(F.desc("cnt"), "user_id")
    )
    kept = sc.withColumn("rk", rk).where(F.col("rk") <= _TOPK_K)
    thr = kept.groupBy("shard").agg(F.min("cnt").alias("thr"))
    all_thr = thr.agg(F.sum("thr").alias("all_thr"))
    est = (
        kept.join(F.broadcast(thr), "shard")
        .crossJoin(F.broadcast(all_thr))
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("est_lower"),
            (F.sum("cnt") + F.first("all_thr") - F.sum("thr")).alias("est_upper"),
        )
    )
    exact = sharded.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    top10 = exact.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("exact_cnt"), "user_id"))
    ).where(F.col("rnk") <= _TOPK_OUT)
    j = top10.join(est.withColumnRenamed("user_id", "e_uid"),
                   F.col("e_uid") == F.col("user_id"), "left")
    return j.select(
        "user_id",
        "exact_cnt",
        F.col("rnk").cast("int").alias("rnk"),
        "est_lower",
        "est_upper",
        F.col("e_uid").isNotNull().cast("int").alias("in_candidates"),
        (
            F.col("e_uid").isNull()
            | ((F.col("est_lower") <= F.col("exact_cnt")) & (F.col("exact_cnt") <= F.col("est_upper")))
        )
        .cast("int")
        .alias("bound_ok"),
    )
