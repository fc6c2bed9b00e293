"""Model-evaluation metrics and label-pipeline operators.

A training-data pipeline doesn't stop at building the corpus — it has
to *measure* the models trained on it and the labels fed into it. This
suite adds the evaluation surface as first-class distributed operators:
exact AUC, thresholded confusion matrices, calibration bins,
Brier/log-loss, NDCG@k ranking quality, out-of-fold target encoding,
and inter-annotator agreement (pairwise Cohen's kappa).

Every metric is computed the way it must be computed at 100 TB:
aggregate first, then do the order-statistics work over the *aggregate*
(score histogram, per-user top-k), never a global sort of raw rows.
House rules (operators/catalog.py): exact integer arithmetic up to a
single final IEEE division, identical aliases both sides, pinned
tiebreaks. Scores/labels/votes are derived deterministically from row
keys by multiplicative hashing (pure BIGINT mod arithmetic — portable
to any engine, stable under retries; same rationale as ops/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Deterministic synthetic (score, label) pairs over the embeddings table.
#
# y = label % 2 (binary task); the score is an INTEGER in [0, 999]
# ("sx", i.e. score×1000): h = Knuth-hash(vec_id) mod 600 gives noise,
# positives shift +400 — so positives live in [400, 999] and negatives
# in [0, 599], overlapping on [400, 599]. Keeping the score integral is
# what lets every metric below stay exact until one final division.
# The implied probability is p = (2·sx + 1) / 2000 ∈ (0, 1) strictly.
# ---------------------------------------------------------------------------
_SCORES_SQL = """
  SELECT vec_id,
         label % 2 AS y,
         ((vec_id * 2654435761 + 40503) % 100000) % 600
           + (label % 2) * 400 AS sx
  FROM embeddings
"""


def _binary_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).cast("bigint")
    h = (F.col("vec_id") * F.lit(2654435761) + F.lit(40503)) % 100000
    return emb.select(
        "vec_id",
        y.alias("y"),
        ((h % 600) + y * 400).cast("bigint").alias("sx"),
    )


def _score_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sx, pos, neg) histogram — the scale-safe reduction every metric
    here runs on: one map-side-combining groupBy collapses N rows to at
    most 1000, and all order-statistics windows run over THAT."""
    return (
        _binary_scores(spark, sf_dir)
        .groupBy("sx")
        .agg(
            F.sum("y").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).alias("neg"),
        )
    )


_HIST_SQL = f"""
  SELECT sx, CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum(1 - y) AS BIGINT) AS neg
  FROM ({_SCORES_SQL}) GROUP BY sx
"""


@query(
    "ml_auc_rank",
    # Exact ROC-AUC by the rank-sum identity, computed over the score
    # HISTOGRAM: AUC·2PN = Σ_b pos_b · (2·neg_below_b + neg_b) — the
    # Mann-Whitney U with the tie correction built in (each tied block
    # contributes half). Integer until the one final division.
    oracle=f"""
    WITH hist AS ({_HIST_SQL}),
    cum AS (
      SELECT pos, neg,
             COALESCE(sum(neg) OVER (ORDER BY sx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM hist
    ),
    tot AS (
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(neg) AS BIGINT) AS n_neg,
             CAST(sum(pos * (2 * neg_below + neg)) AS BIGINT) AS numer2
      FROM cum
    )
    SELECT n_pos, n_neg,
           CAST(numer2 AS DOUBLE) / (2 * n_pos * n_neg) AS auc
    FROM tot
    """,
    survey_ref="beyond-reference: exact ROC-AUC via the rank-sum "
    "identity over a score histogram — model-eval for the training "
    "pipeline without a global sort",
)
def ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC with tie handling, O(distinct scores) ordered work.

    Scale: the raw table collapses to ≤1000 histogram rows via one
    combining groupBy; the cumulative window and the final fold run
    over the histogram only, so the single-partition window touches KB
    regardless of input size. numer2 ≤ 2·P·N overflows BIGINT only
    past ~2e9 rows per class — cast the histogram counts to
    DECIMAL(38,0) at that scale, same plan."""
    hist = _score_hist(spark, sf_dir)
    w = Window.orderBy("sx").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    tot = cum.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
        ).alias("numer2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        (
            F.col("numer2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


@query(
    "ml_confusion_threshold",
    # One histogram pass, then a 3-row broadcast of thresholds; every
    # rate is a single division of exact counts (F1 via the
    # 2tp/(2tp+fp+fn) form — one division, not three).
    oracle=f"""
    WITH hist AS ({_HIST_SQL}),
    conf AS (
      SELECT t.thr AS threshold_milli,
             CAST(sum(CASE WHEN sx >= t.thr THEN pos ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN sx >= t.thr THEN neg ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN sx < t.thr THEN pos ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN sx < t.thr THEN neg ELSE 0 END) AS BIGINT) AS tn
      FROM hist CROSS JOIN (VALUES (300), (500), (700)) AS t(thr)
      GROUP BY t.thr
    )
    SELECT threshold_milli, tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
           CAST(tp AS DOUBLE) / (tp + fn) AS recall_,
           CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1
    FROM conf
    """,
    survey_ref="beyond-reference: confusion matrix + precision/recall/"
    "F1 at multiple thresholds from one score-histogram pass",
)
def ml_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts at thresholds {0.3, 0.5, 0.7} (milli-units).

    Scale: thresholds replicate the ≤1000-row histogram, never the
    fact table — the plan is one combining groupBy, a broadcast-range
    crossJoin of 3 rows, and a 3-group aggregate."""
    hist = _score_hist(spark, sf_dir)
    thr = spark.createDataFrame(
        [(300,), (500,), (700,)], "thr int"
    )
    above = F.col("sx") >= F.col("thr")
    conf = (
        hist.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(F.when(above, F.col("pos")).otherwise(0)).alias("tp"),
            F.sum(F.when(above, F.col("neg")).otherwise(0)).alias("fp"),
            F.sum(F.when(~above, F.col("pos")).otherwise(0)).alias("fn"),
            F.sum(F.when(~above, F.col("neg")).otherwise(0)).alias("tn"),
        )
    )
    return conf.select(
        F.col("thr").alias("threshold_milli"),
        "tp",
        "fp",
        "fn",
        "tn",
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias(
            "precision_"
        ),
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).alias(
            "recall_"
        ),
        (
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
        ).alias("f1"),
    )


@query(
    "ml_calibration_bins",
    # Equal-width decile bins on the integer score; mean predicted
    # probability per bin is exact: p = (2·sx+1)/2000 so
    # mean_p = (2·Σsx + n) / (2000·n) — integer numerator, one
    # division. The |gap| subtracts two deterministic doubles.
    oracle=f"""
    WITH s AS ({_SCORES_SQL})
    SELECT sx // 100 AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(2 * sum(sx) + count(*) AS DOUBLE) / (2000 * count(*))
             AS mean_pred,
           CAST(sum(y) AS DOUBLE) / count(*) AS frac_pos,
           abs(CAST(2 * sum(sx) + count(*) AS DOUBLE) / (2000 * count(*))
               - CAST(sum(y) AS DOUBLE) / count(*)) AS abs_gap
    FROM s GROUP BY sx // 100
    """,
    survey_ref="beyond-reference: calibration-curve bins (reliability "
    "diagram input) with exact per-bin mean prediction",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten calibration bins: n, positives, mean p̂, empirical rate, gap.

    Scale: one combining groupBy to 10 rows; ECE is a trivial driver-
    side fold of this output (Σ n·gap / N)."""
    s = _binary_scores(spark, sf_dir)
    g = s.groupBy(F.expr("sx div 100").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("sx").alias("_ssx"),
    )
    mean_pred = (2 * F.col("_ssx") + F.col("n")).cast("double") / (
        2000 * F.col("n")
    )
    frac_pos = F.col("n_pos").cast("double") / F.col("n")
    return g.select(
        "bin",
        "n",
        "n_pos",
        mean_pred.alias("mean_pred"),
        frac_pos.alias("frac_pos"),
        F.abs(mean_pred - frac_pos).alias("abs_gap"),
    )


@query(
    "ml_brier_logloss",
    # Brier is EXACT integer arithmetic: (p−y)·2000 = 2·sx+1−2000·y, so
    # Σ(p−y)² = Σ(2sx+1−2000y)² / 2000² — BIGINT numerator (4e6 per
    # row: overflows past ~2e12 rows; decimal-cast there), one final
    # division. Log-loss needs ln(), which libm won't promise
    # bit-identical across engines AND float summation is
    # order-dependent — so each distinct-score term is scaled to 1e-9
    # resolution and summed as BIGINT: deterministic under any
    # partitioning, and the cross-engine match is certified by this
    # oracle (ln of the same 1000 rationals, same rounding).
    oracle=f"""
    WITH hist AS ({_HIST_SQL}),
    terms AS (
      SELECT pos, neg, sx,
             CAST(round((pos * -ln(CAST(2*sx + 1 AS DOUBLE) / 2000)
                         + neg * -ln(1 - CAST(2*sx + 1 AS DOUBLE) / 2000))
                        * 1e9, 0)
                  AS BIGINT) AS ll_scaled,
             pos * (2*sx + 1 - 2000) * (2*sx + 1 - 2000)
               + neg * (2*sx + 1) * (2*sx + 1) AS sq_num
      FROM hist
    )
    SELECT CAST(sum(pos + neg) AS BIGINT) AS n,
           CAST(sum(sq_num) AS DOUBLE) / (sum(pos + neg) * 4000000)
             AS brier,
           CAST(sum(ll_scaled) AS DOUBLE) / (sum(pos + neg) * 1e9)
             AS logloss
    FROM terms
    """,
    survey_ref="beyond-reference: Brier score (exact) and log-loss "
    "(fixed-point, partition-order-independent) — probabilistic "
    "model-eval aggregates",
)
def ml_brier_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score and log-loss over the (score, label) pairs.

    Scale: both ride the ≤1000-row score histogram. The log-loss
    fixed-point trick (per-distinct-score term → round(·1e9) → BIGINT
    sum) is what makes a transcendental aggregate hash-stable: double
    summation is non-associative, integer summation isn't."""
    hist = _score_hist(spark, sf_dir)
    p = (2 * F.col("sx") + 1) / F.lit(2000.0)
    ll_term = (
        F.col("pos") * -F.log(p) + F.col("neg") * -F.log(1 - p)
    )
    dev_pos = 2 * F.col("sx") + 1 - 2000
    dev_neg = 2 * F.col("sx") + 1
    terms = hist.select(
        (F.col("pos") + F.col("neg")).alias("cnt"),
        F.round(ll_term * 1e9, 0).cast("bigint").alias("ll_scaled"),
        (
            F.col("pos") * dev_pos * dev_pos
            + F.col("neg") * dev_neg * dev_neg
        ).alias("sq_num"),
    )
    return terms.agg(
        F.sum("cnt").alias("n"),
        (
            F.sum("sq_num").cast("double")
            / (F.sum("cnt") * F.lit(4000000))
        ).alias("brier"),
        (
            F.sum("ll_scaled").cast("double") / (F.sum("cnt") * F.lit(1e9))
        ).alias("logloss"),
    )


# ---------------------------------------------------------------------------
# NDCG@10 — ranking quality per user over the events stream. Graded
# relevance from event_type (purchase 3, signup 2, click 1, view/error
# 0 → gains 2^rel−1 ∈ {7,3,1,0}); the model's ranking is a
# deterministic hash of event_id. The discount weights 1/log2(pos+1)
# are pre-scaled ×1e9 INTEGER LITERALS (identical in both engines), so
# DCG and ideal-DCG are exact BIGINTs and NDCG is one division — no
# libm, no float summation, bit-stable.
# ---------------------------------------------------------------------------
_NDCG_W = (
    1000000000, 630929754, 500000000, 430676558, 386852807,
    356207187, 333333333, 315464877, 301029996, 289064826,
)


def _w_case_sql(col: str) -> str:
    whens = " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W))
    return f"(CASE {col} {whens} ELSE 0 END)"


@query(
    "ml_ndcg_at_k",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id,
             CAST(CASE event_type WHEN 'purchase' THEN 7 WHEN 'signup' THEN 3
                  WHEN 'click' THEN 1 ELSE 0 END AS BIGINT) AS gain,
             (event_id * 2654435761 + 97) % 100000 AS hs
      FROM events
    ),
    ranked AS (
      SELECT user_id, gain,
             row_number() OVER (PARTITION BY user_id
               ORDER BY hs DESC, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id
               ORDER BY gain DESC, event_id) AS irn
      FROM g
    ),
    per_user AS (
      SELECT user_id,
             CAST(sum(gain * {_w_case_sql("rn")}) AS BIGINT) AS dcg_scaled,
             CAST(sum(gain * {_w_case_sql("irn")}) AS BIGINT) AS idcg_scaled
      FROM ranked GROUP BY user_id
    )
    SELECT user_id, dcg_scaled, idcg_scaled,
           CASE WHEN idcg_scaled = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(dcg_scaled AS DOUBLE) / idcg_scaled
           END AS ndcg_at_10
    FROM per_user
    """,
    survey_ref="beyond-reference: NDCG@10 per ranking context — "
    "search/recommendation eval as a distributed aggregate",
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per user: model ranking vs ideal ranking, exact.

    Scale: one user_id shuffle; the two row_number windows share the
    exchange (same partition key) and WindowGroupLimit caps the sort
    output at k per user. Weights are integer literals → BIGINT DCG,
    one division per user, no transcendental in the plan."""
    ev = load_table(spark, sf_dir, "events")
    gain = (
        F.when(F.col("event_type") == "purchase", 7)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
    )
    g = ev.select(
        "user_id",
        "event_id",
        gain.cast("bigint").alias("gain"),
        ((F.col("event_id") * F.lit(2654435761) + 97) % 100000).alias("hs"),
    )
    wm = Window.partitionBy("user_id").orderBy(
        F.col("hs").desc(), F.col("event_id")
    )
    wi = Window.partitionBy("user_id").orderBy(
        F.col("gain").desc(), F.col("event_id")
    )
    ranked = g.select(
        "user_id",
        "gain",
        F.row_number().over(wm).alias("rn"),
        F.row_number().over(wi).alias("irn"),
    )

    def w_of(col: str) -> F.Column:
        expr = F.lit(0)
        for i, w in enumerate(_NDCG_W):
            expr = F.when(F.col(col) == i + 1, F.lit(w)).otherwise(expr)
        return expr

    per_user = ranked.groupBy("user_id").agg(
        F.sum(F.col("gain") * w_of("rn")).alias("dcg_scaled"),
        F.sum(F.col("gain") * w_of("irn")).alias("idcg_scaled"),
    )
    return per_user.select(
        "user_id",
        "dcg_scaled",
        "idcg_scaled",
        F.when(F.col("idcg_scaled") == 0, F.lit(0.0))
        .otherwise(
            F.col("dcg_scaled").cast("double") / F.col("idcg_scaled")
        )
        .alias("ndcg_at_10"),
    )


@query(
    "fe_target_encode",
    # Out-of-fold target encoding with additive smoothing: for each
    # (category, fold), the encoding uses every OTHER fold's rows —
    # enc = (pos_oof + prior·m) / (n_oof + m) with prior=0.5, m=10, so
    # the numerator is the integer pos_oof + 5. Leak-free by
    # construction, exact until the one division.
    oracle="""
    WITH lab AS (
      SELECT lang,
             (doc_id * 2654435761) % 5 AS fold,
             CASE WHEN (doc_id * 7919 + 13) % 97 < 40 THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    per AS (
      SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_fold,
             CAST(sum(y) AS BIGINT) AS pos_fold
      FROM lab GROUP BY lang, fold
    ),
    oof AS (
      SELECT lang, fold, n_fold, pos_fold,
             CAST(sum(n_fold) OVER (PARTITION BY lang) - n_fold AS BIGINT)
               AS n_oof,
             CAST(sum(pos_fold) OVER (PARTITION BY lang) - pos_fold AS BIGINT)
               AS pos_oof
      FROM per
    )
    SELECT lang, fold, n_fold, pos_fold, n_oof, pos_oof,
           CAST(pos_oof + 5 AS DOUBLE) / (n_oof + 10) AS enc
    FROM oof
    """,
    survey_ref="beyond-reference: out-of-fold smoothed target encoding "
    "— the leak-free categorical feature transform for training",
)
def fe_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed out-of-fold target encoding per (category, fold).

    Scale: one (lang, fold) groupBy collapses the corpus to
    |categories|·|folds| rows; the per-category totals come from a
    window over that aggregate (KB). Applying the encoding to the fact
    table is then a broadcast join on (lang, fold) — never computed
    here row-at-a-time."""
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "lang",
        ((F.col("doc_id") * F.lit(2654435761)) % 5).alias("fold"),
        F.when((F.col("doc_id") * 7919 + 13) % 97 < 40, 1)
        .otherwise(0)
        .alias("y"),
    )
    per = lab.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_fold"), F.sum("y").alias("pos_fold")
    )
    w = Window.partitionBy("lang")
    oof = per.select(
        "lang",
        "fold",
        "n_fold",
        "pos_fold",
        (F.sum("n_fold").over(w) - F.col("n_fold")).alias("n_oof"),
        (F.sum("pos_fold").over(w) - F.col("pos_fold")).alias("pos_oof"),
    )
    return oof.select(
        "lang",
        "fold",
        "n_fold",
        "pos_fold",
        "n_oof",
        "pos_oof",
        (
            (F.col("pos_oof") + 5).cast("double") / (F.col("n_oof") + 10)
        ).alias("enc"),
    )


# ---------------------------------------------------------------------------
# Inter-annotator agreement. Three synthetic annotators: each observes
# a latent truth t(doc) and flips it ~20% of the time (all pure BIGINT
# mod arithmetic). Pairwise Cohen's kappa stays exact: with N docs,
# agreement a and per-annotator positive counts pa/pb,
#   kappa = (N·a − E) / (N² − E),  E = pa·pb + (N−pa)·(N−pb)
# — integer numerator and denominator, one division.
# ---------------------------------------------------------------------------
_VOTES_SQL = """
  SELECT doc_id,
         CASE WHEN ((doc_id * 2654435761) % 100 < 50)
                   <> ((doc_id * 31 + 7) % 100 < 20) THEN 1 ELSE 0 END AS v1,
         CASE WHEN ((doc_id * 2654435761) % 100 < 50)
                   <> ((doc_id * 53 + 11) % 100 < 20) THEN 1 ELSE 0 END AS v2,
         CASE WHEN ((doc_id * 2654435761) % 100 < 50)
                   <> ((doc_id * 97 + 3) % 100 < 20) THEN 1 ELSE 0 END AS v3
  FROM documents
"""


@query(
    "lab_agreement",
    oracle=f"""
    WITH v AS ({_VOTES_SQL}),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v1) AS BIGINT) AS p1,
             CAST(sum(v2) AS BIGINT) AS p2,
             CAST(sum(v3) AS BIGINT) AS p3,
             CAST(sum(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS BIGINT) AS a12,
             CAST(sum(CASE WHEN v1 = v3 THEN 1 ELSE 0 END) AS BIGINT) AS a13,
             CAST(sum(CASE WHEN v2 = v3 THEN 1 ELSE 0 END) AS BIGINT) AS a23
      FROM v
    ),
    pairs AS (
      SELECT pr.pair, n,
             CASE pr.pair WHEN 'a1-a2' THEN a12 WHEN 'a1-a3' THEN a13
                  ELSE a23 END AS n_agree,
             CASE pr.pair WHEN 'a2-a3' THEN p2 ELSE p1 END AS pos_a,
             CASE pr.pair WHEN 'a1-a2' THEN p2 ELSE p3 END AS pos_b
      FROM agg CROSS JOIN (VALUES ('a1-a2'), ('a1-a3'), ('a2-a3'))
        AS pr(pair)
    )
    SELECT pair, n, n_agree, pos_a, pos_b,
           CAST(n * n_agree - (pos_a * pos_b + (n - pos_a) * (n - pos_b))
                AS DOUBLE)
             / (n * n - (pos_a * pos_b + (n - pos_a) * (n - pos_b)))
             AS kappa
    FROM pairs
    """,
    survey_ref="beyond-reference: pairwise Cohen's kappa over annotator "
    "votes — label-quality measurement for the data pipeline",
)
def lab_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise inter-annotator agreement (Cohen's kappa), exact.

    Scale: ONE full-table aggregate produces all sufficient statistics
    (N, per-annotator positives, pairwise agreements); the 3 output
    rows come from a broadcast crossJoin against that 1-row frame —
    annotator-pair fan-out never touches the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    t = (F.col("doc_id") * F.lit(2654435761)) % 100 < 50

    def vote(mult: int, off: int) -> F.Column:
        flip = (F.col("doc_id") * mult + off) % 100 < 20
        return F.when(t != flip, 1).otherwise(0)

    v = docs.select(
        vote(31, 7).alias("v1"),
        vote(53, 11).alias("v2"),
        vote(97, 3).alias("v3"),
    )
    agg = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v1").alias("p1"),
        F.sum("v2").alias("p2"),
        F.sum("v3").alias("p3"),
        F.sum((F.col("v1") == F.col("v2")).cast("int")).alias("a12"),
        F.sum((F.col("v1") == F.col("v3")).cast("int")).alias("a13"),
        F.sum((F.col("v2") == F.col("v3")).cast("int")).alias("a23"),
    )
    pairs = spark.createDataFrame(
        [("a1-a2",), ("a1-a3",), ("a2-a3",)], "pair string"
    )
    joined = agg.crossJoin(F.broadcast(pairs))
    n_agree = (
        F.when(F.col("pair") == "a1-a2", F.col("a12"))
        .when(F.col("pair") == "a1-a3", F.col("a13"))
        .otherwise(F.col("a23"))
    )
    pos_a = F.when(F.col("pair") == "a2-a3", F.col("p2")).otherwise(
        F.col("p1")
    )
    pos_b = F.when(F.col("pair") == "a1-a2", F.col("p2")).otherwise(
        F.col("p3")
    )
    e = pos_a * pos_b + (F.col("n") - pos_a) * (F.col("n") - pos_b)
    return joined.select(
        "pair",
        "n",
        n_agree.alias("n_agree"),
        pos_a.alias("pos_a"),
        pos_b.alias("pos_b"),
        (
            (F.col("n") * n_agree - e).cast("double")
            / (F.col("n") * F.col("n") - e)
        ).alias("kappa"),
    )


@query(
    "ml_pr_curve",
    # The full precision/recall/lift sweep: one row per distinct score,
    # thresholding at sx ≥ t. tp/fp are DESCENDING cumulative sums over
    # the histogram; precision, recall, and lift are single divisions
    # of exact BIGINTs (lift = tp·(P+N) / ((tp+fp)·P) — precision over
    # base rate without intermediate rates).
    oracle=f"""
    WITH hist AS ({_HIST_SQL}),
    cum AS (
      SELECT sx,
             sum(pos) OVER (ORDER BY sx DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(neg) OVER (ORDER BY sx DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
             sum(pos) OVER () AS p,
             sum(neg) OVER () AS nn
      FROM hist
    )
    SELECT sx AS threshold_milli, CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
           CAST(tp AS DOUBLE) / p AS recall_,
           CAST(tp * (p + nn) AS DOUBLE) / ((tp + fp) * p) AS lift
    FROM cum
    """,
    survey_ref="beyond-reference: full PR-curve / cumulative-gains "
    "sweep (precision, recall, lift at every distinct threshold) from "
    "one histogram pass — the campaign-targeting eval table",
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/lift at every distinct score threshold.

    Scale: the threshold sweep is a descending cumulative window over
    the ≤1000-row score histogram — the raw corpus is touched once by
    the combining groupBy. AP/AUPRC is a driver-side fold of this
    output."""
    hist = _score_hist(spark, sf_dir)
    w_cum = Window.orderBy(F.col("sx").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "sx",
        F.sum("pos").over(w_cum).alias("tp"),
        F.sum("neg").over(w_cum).alias("fp"),
        F.sum("pos").over(w_all).alias("p"),
        F.sum("neg").over(w_all).alias("nn"),
    )
    return cum.select(
        F.col("sx").alias("threshold_milli"),
        "tp",
        "fp",
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias(
            "precision_"
        ),
        (F.col("tp").cast("double") / F.col("p")).alias("recall_"),
        (
            (F.col("tp") * (F.col("p") + F.col("nn"))).cast("double")
            / ((F.col("tp") + F.col("fp")) * F.col("p"))
        ).alias("lift"),
    )


@query(
    "lab_pref_pairs",
    # Preference-pair construction (RLHF-style training data): within
    # each group, pair the top-k docs by score ("chosen") against the
    # bottom-k ("rejected"), keeping pairs whose margin clears a
    # threshold. BOTH sides are rank-capped BEFORE the pairing join —
    # k² pairs per group by construction, never |group|².
    oracle="""
    WITH scored AS (
      SELECT lang, doc_id,
             (doc_id * 2654435761 + 17) % 1000 AS s
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, s,
             row_number() OVER (PARTITION BY lang
               ORDER BY s DESC, doc_id) AS rk_top,
             row_number() OVER (PARTITION BY lang
               ORDER BY s ASC, doc_id) AS rk_bot
      FROM scored
    )
    SELECT c.lang, c.doc_id AS chosen_id, r.doc_id AS rejected_id,
           CAST(c.s - r.s AS BIGINT) AS margin
    FROM ranked c JOIN ranked r
      ON c.lang = r.lang AND c.rk_top <= 4 AND r.rk_bot <= 4
     AND c.doc_id <> r.doc_id AND c.s - r.s >= 100
    """,
    survey_ref="beyond-reference: preference-pair construction — "
    "rank-capped chosen/rejected pairing with a margin floor, the "
    "RLHF/DPO training-data shape",
)
def lab_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chosen, rejected) preference pairs per group, margin ≥ 100.

    Scale: the two row_number windows share one lang shuffle and
    WindowGroupLimit caps their sort output at k; the pairing join
    runs on two k-row-per-group slivers (k=4), so output and work are
    O(groups·k²) no matter how large the groups get — the naive
    all-pairs-then-filter version is the quadratic trap."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761) + 17) % 1000).alias("s"),
    )
    w_top = Window.partitionBy("lang").orderBy(F.col("s").desc(), "doc_id")
    w_bot = Window.partitionBy("lang").orderBy(F.col("s").asc(), "doc_id")
    ranked = scored.select(
        "lang",
        "doc_id",
        "s",
        F.row_number().over(w_top).alias("rk_top"),
        F.row_number().over(w_bot).alias("rk_bot"),
    )
    c = ranked.filter(F.col("rk_top") <= 4).alias("c")
    r = ranked.filter(F.col("rk_bot") <= 4).alias("r")
    return c.join(
        r,
        (F.col("c.lang") == F.col("r.lang"))
        & (F.col("c.doc_id") != F.col("r.doc_id"))
        & (F.col("c.s") - F.col("r.s") >= 100),
    ).select(
        F.col("c.lang").alias("lang"),
        F.col("c.doc_id").alias("chosen_id"),
        F.col("r.doc_id").alias("rejected_id"),
        (F.col("c.s") - F.col("r.s")).cast("bigint").alias("margin"),
    )
