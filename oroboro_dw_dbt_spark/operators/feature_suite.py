"""Round-6 eighth wave: feature engineering + retrieval scoring.

Six shapes every tabular/text training pipeline needs between raw
corpus and model input, none covered by the catalog yet:

- ``fe_scaler_suite`` — the three standard numeric scalers (per-group
  z-score, global min-max, robust median/IQR) from EXACT integer
  sufficient statistics: count/sum/sum-of-squares are BIGINT
  aggregates (order-independent, no float drift), the scalar double
  derivation is the identical expression on both engines, and outputs
  ship as fixed-point micros.
- ``fe_quantile_bins`` — decile binning against broadcast percentile
  edges (the feature-bucketing primitive): 9 exact percentiles from
  one aggregate row, bin id = 1 + Σ[x > eᵢ].
- ``fe_onehot_topk`` — top-k-category one-hot with an explicit
  '(count DESC, value)' tie-break and an ``other`` bucket — the
  vocabulary-capped encoding that keeps wide categoricals bounded.
- ``fe_hashed_cross`` — the hashing-trick feature cross
  (lang × source → md5 → 64 buckets) with per-bucket collision
  diagnostics; no vocabulary table, fully deterministic (md5 house
  idiom, ops/sampling.py).
- ``ts_autocorr`` — lag-1/lag-7 autocorrelation of per-type daily
  event counts via a day-offset self-equi-join (gap-safe: missing
  days drop pairs instead of silently mis-lagging) and exact integer
  Pearson sums.
- ``t_bm25_topk`` — BM25 retrieval scoring (k1=1.2, b=0.75) for a
  fixed query over the documents corpus; per-term contributions are
  fixed-point BIGINT *before* the final sum, so the cross-term
  addition is order-independent by construction.

House rules (operators/catalog.py): exact integer aggregates before
any double math, identical scalar expressions both engines,
fixed-point outputs, explicit tie-breaks. The reference (3 BigQuery
models, models/marts/core/*.sql) has no feature-engineering surface;
SURVEY §6 scopes these families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

_QUANTS = [i / 10 for i in range(1, 10)]
_CROSS_BUCKETS = 64
_BM25_TERMS = ("join", "hash", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


@query(
    "fe_scaler_suite",
    oracle="""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ssq
      FROM documents GROUP BY lang
    ),
    gl AS (
      SELECT CAST(min(n_chars) AS BIGINT) AS mn,
             CAST(max(n_chars) AS BIGINT) AS mx,
             quantile_cont(n_chars, 0.25) AS p25,
             quantile_cont(n_chars, 0.50) AS p50,
             quantile_cont(n_chars, 0.75) AS p75
      FROM documents
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(round((d.n_chars - CAST(g.s AS DOUBLE) / g.c)
                 / nullif(sqrt((g.ssq - CAST(g.s AS DOUBLE) * g.s / g.c)
                               / (g.c - 1)), 0) * 1e6, 0) AS BIGINT) AS z_micro,
           CAST(round(CAST(d.n_chars - gl.mn AS DOUBLE)
                 / nullif(gl.mx - gl.mn, 0) * 1e6, 0) AS BIGINT) AS mm_micro,
           CAST(round((d.n_chars - gl.p50)
                 / nullif(gl.p75 - gl.p25, 0) * 1e6, 0) AS BIGINT) AS rb_micro
    FROM documents d JOIN g ON g.lang = d.lang CROSS JOIN gl
    """,
    survey_ref="beyond-reference: z-score / min-max / robust scalers from "
    "exact integer sufficient statistics (broadcast group stats)",
)
def fe_scaler_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard numeric scalers over documents.n_chars.

    Scale: per-group stats are a partial-aggregating groupBy whose
    result is |langs| rows → broadcast back; the global stats are ONE
    row. The fact table is scanned twice but never shuffled on a data
    key — at 100 TB both joins are map-side. Exact BIGINT sums make
    the derivation bit-identical regardless of partitioning."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count("*").alias("c"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ssq"),
    )
    glob = d.agg(
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
        F.percentile("n_chars", F.lit(0.25)).alias("p25"),
        F.percentile("n_chars", F.lit(0.50)).alias("p50"),
        F.percentile("n_chars", F.lit(0.75)).alias("p75"),
    )
    x = F.col("n_chars")
    mean = F.col("s").cast("double") / F.col("c")
    sd = F.sqrt(
        (F.col("ssq") - F.col("s").cast("double") * F.col("s") / F.col("c"))
        / (F.col("c") - 1)
    )
    iqr = F.col("p75") - F.col("p25")
    rng = (F.col("mx") - F.col("mn")).cast("double")

    def micro(c):
        return F.round(c * 1e6, 0).cast("long")

    return (
        d.join(F.broadcast(g), "lang")
        .crossJoin(F.broadcast(glob))
        .select(
            "doc_id",
            "lang",
            x.cast("long").alias("n_chars"),
            micro((x - mean) / F.nullif(sd, F.lit(0.0))).alias("z_micro"),
            micro((x - F.col("mn")).cast("double") / F.nullif(rng, F.lit(0.0))).alias(
                "mm_micro"
            ),
            micro((x - F.col("p50")) / F.nullif(iqr, F.lit(0.0))).alias("rb_micro"),
        )
    )


@query(
    "fe_quantile_bins",
    oracle="""
    WITH e AS (
      SELECT quantile_cont(n_chars, 0.1) AS e1, quantile_cont(n_chars, 0.2) AS e2,
             quantile_cont(n_chars, 0.3) AS e3, quantile_cont(n_chars, 0.4) AS e4,
             quantile_cont(n_chars, 0.5) AS e5, quantile_cont(n_chars, 0.6) AS e6,
             quantile_cont(n_chars, 0.7) AS e7, quantile_cont(n_chars, 0.8) AS e8,
             quantile_cont(n_chars, 0.9) AS e9
      FROM documents
    ),
    b AS (
      SELECT CAST(1 + CAST(n_chars > e1 AS INT) + CAST(n_chars > e2 AS INT)
                 + CAST(n_chars > e3 AS INT) + CAST(n_chars > e4 AS INT)
                 + CAST(n_chars > e5 AS INT) + CAST(n_chars > e6 AS INT)
                 + CAST(n_chars > e7 AS INT) + CAST(n_chars > e8 AS INT)
                 + CAST(n_chars > e9 AS INT) AS INT) AS bin,
             n_chars
      FROM documents CROSS JOIN e
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM b GROUP BY bin
    """,
    survey_ref="beyond-reference: decile binning against broadcast exact "
    "percentile edges — the feature-bucketing primitive",
)
def fe_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-bin documents by n_chars; report per-bin census.

    Scale: the edges are ONE aggregate row broadcast to the scan; bin
    assignment is a 9-comparison Column expression inside codegen.
    Exact percentiles on a 100 TB column would switch to the sketch
    route (sk_approx_quantiles) — the binning plan is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    e = d.agg(
        *[
            F.percentile("n_chars", F.lit(q)).alias(f"e{i}")
            for i, q in enumerate(_QUANTS, start=1)
        ]
    )
    x = F.col("n_chars")
    bin_col = F.lit(1)
    for i in range(1, 10):
        bin_col = bin_col + (x > F.col(f"e{i}")).cast("int")
    return (
        d.crossJoin(F.broadcast(e))
        .select(bin_col.cast("int").alias("bin"), x.alias("n_chars"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


@query(
    "fe_onehot_topk",
    oracle="""
    WITH top3 AS (
      SELECT source, row_number() OVER (ORDER BY count(*) DESC, source) AS rk
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source,
           CAST(d.source = (SELECT source FROM top3 WHERE rk = 1) AS INT) AS f_top1,
           CAST(d.source = (SELECT source FROM top3 WHERE rk = 2) AS INT) AS f_top2,
           CAST(d.source = (SELECT source FROM top3 WHERE rk = 3) AS INT) AS f_top3,
           CAST(d.source NOT IN (SELECT source FROM top3 WHERE rk <= 3) AS INT)
             AS f_other
    FROM documents d
    """,
    survey_ref="beyond-reference: top-k-category one-hot with 'other' "
    "bucket — vocabulary-capped categorical encoding",
)
def fe_onehot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encode the top-3 sources (+ other) per document.

    The top-3 list is a 3-row driver collect — it is the encoding
    vocabulary itself (the artifact a feature store would persist),
    tie-broken (count DESC, source). Flags evaluate as literals
    inside codegen; no join at apply time — exactly how a trained
    encoder applies at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    top = [
        r["source"]
        for r in d.groupBy("source")
        .count()
        # asc_nulls_last pins the tie-break to the oracle's ORDER BY
        # source (DuckDB default NULLS LAST); Spark's bare asc sorts
        # NULLs FIRST, which would pick a different vocabulary if a
        # NULL-source group ever tied at the top-3 boundary (ADVICE r07)
        .orderBy(F.desc("count"), F.asc_nulls_last("source"))
        .limit(3)
        .collect()
    ]
    # Degenerate corpora (<3 distinct sources): pad with None so the
    # missing-rank flags are NULL, matching the oracle's empty-scalar
    # subquery semantics instead of raising IndexError (ADVICE r06 #3).
    present = list(top)
    top += [None] * (3 - len(top))
    s = F.col("source")

    def flag(tok):
        if tok is None:
            return F.lit(None).cast("int")
        return (s == tok).cast("int")

    return d.select(
        "doc_id",
        "source",
        flag(top[0]).alias("f_top1"),
        flag(top[1]).alias("f_top2"),
        flag(top[2]).alias("f_top3"),
        (~s.isin(present)).cast("int").alias("f_other"),
    )


@query(
    "fe_hashed_cross",
    oracle=f"""
    WITH x AS (
      SELECT lang || '|' || source AS cross_key,
             CAST('0x' || substr(md5('fx1|' || lang || '|' || source), 1, 4)
                  AS INTEGER) % {_CROSS_BUCKETS} AS bucket
      FROM documents
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT cross_key) AS BIGINT) AS n_crosses
    FROM x GROUP BY bucket
    """,
    survey_ref="beyond-reference: hashing-trick feature cross "
    "(lang × source → md5 → buckets) with collision diagnostics",
)
def fe_hashed_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-cross lang×source into 64 buckets; per-bucket census.

    The hashing trick needs NO vocabulary table or fit pass — the
    bucket id is a pure Column expression (md5 house idiom), so the
    cross scales to arbitrarily many distinct combinations with zero
    state; n_crosses > 1 rows surface the collisions the fixed width
    trades for that."""
    d = load_table(spark, sf_dir, "documents")
    key = F.concat_ws("|", "lang", "source")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fx1|"), key)), 1, 4), 16, 10)
        .cast("int")
        % _CROSS_BUCKETS
    )
    return (
        d.select(key.alias("cross_key"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("cross_key").alias("n_crosses"),
        )
    )


@query(
    "ts_autocorr",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, k.lag_k, a.cnt AS x, b.cnt AS y
      FROM daily a
      JOIN (SELECT unnest([1, 7]) AS lag_k) k ON true
      JOIN daily b ON b.event_type = a.event_type AND b.day = a.day - k.lag_k
    ),
    s AS (
      SELECT event_type, CAST(lag_k AS INT) AS lag_k,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag_k, n_pairs,
           CAST(round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / nullif(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0)
                 * 1e6, 0) AS BIGINT) AS r_micro
    FROM s
    """,
    survey_ref="beyond-reference: lag-1/lag-7 autocorrelation of daily "
    "event counts — day-offset self-join (gap-safe), exact integer "
    "Pearson sums",
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation r(1), r(7) of per-type daily event counts.

    The lag is an explicit day-offset equi-join, not a row-offset
    window — missing days drop the pair instead of silently lagging
    the wrong distance. All Pearson sufficient statistics are BIGINT
    (daily counts × 30-day horizon keep every product far inside 2⁶³);
    one double expression at the end. Scale: the daily rollup is the
    only corpus-wide shuffle; the self-join runs on |types|×|days|
    rows — KB forever."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    lags = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7))).alias("lag_k")
    )
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.day") == F.col("a.day") - F.col("lag_k")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("lag_k").cast("int").alias("lag_k"),
        F.col("a.cnt").alias("x"),
        F.col("b.cnt").alias("y"),
    )
    s = pairs.groupBy("event_type", "lag_k").agg(
        F.count("*").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "event_type",
        "lag_k",
        "n_pairs",
        F.round(num / F.nullif(den, F.lit(0.0)) * 1e6, 0)
        .cast("long")
        .alias("r_micro"),
    )


@query(
    "t_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
      FROM documents
    ),
    toks AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE token IN ('join', 'hash', 'scan')
      GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    contrib AS (
      SELECT tf.doc_id,
             CAST(round(
               ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * {_BM25_K1 + 1.0})
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                   + {_BM25_B} * dl.dl / (CAST(c.tot AS DOUBLE) / c.n_docs)))
               * 1e9, 0) AS BIGINT) AS c_nano
      FROM tf JOIN df ON df.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN corpus c
    ),
    scores AS (
      SELECT doc_id, CAST(sum(c_nano) AS BIGINT) AS score_nano
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score_nano, rnk FROM (
      SELECT doc_id, score_nano,
             CAST(row_number() OVER (ORDER BY score_nano DESC, doc_id) AS INT) AS rnk
      FROM scores
    ) WHERE rnk <= {_BM25_TOPK}
    """,
    survey_ref="beyond-reference: BM25 retrieval scoring (k1=1.2, b=0.75) — "
    "per-term fixed-point contributions summed as integers",
)
def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 for query ('join','hash','scan').

    Per-term contributions are rounded to nano fixed-point BEFORE the
    cross-term sum, so the sum is an integer aggregate — order-
    independent under any partitioning (the float-sum-order hazard
    engineered out, house rule). df/dl/N are exact BIGINTs; the tf
    table only materializes query-term postings (the filter pushes
    into the token explode). Scale: this is the standard DAAT scoring
    plan — postings equi-join + integer agg; top-k is a single
    row_number over |candidate docs|."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("token")
    ).where(F.col("token") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("tot")
    )
    tf = (
        toks.where(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    avgdl = F.col("tot").cast("double") / F.col("n_docs")
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    c_nano = F.round(
        idf
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl)
        )
        * 1e9,
        0,
    ).cast("long")
    contrib = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", c_nano.alias("c_nano"))
    )
    scores = contrib.groupBy("doc_id").agg(F.sum("c_nano").alias("score_nano"))
    w = Window.orderBy(F.desc("score_nano"), "doc_id")
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _BM25_TOPK)
        .select("doc_id", "score_nano", "rnk")
    )
