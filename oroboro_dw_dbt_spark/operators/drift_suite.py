"""Distribution-drift detection and late-arriving SQL-surface parity.

Drift detection is the monitoring half of a production corpus pipeline:
when the 100 TB table is re-ingested weekly, these operators answer
"did the data move?" as cheap aggregates — a chi-square independence
test over categorical cells, a two-sample Kolmogorov-Smirnov statistic
over score distributions, and PSI (population stability index) over
binned scores. All three follow the house exact-arithmetic rules
(operators/catalog.py): integer or fixed-point numerators, a single
final IEEE division, partition-order independence by construction.

The two `sql_*` entries certify Spark 4's recursive-query surface —
`WITH RECURSIVE` and correlated `LATERAL` subqueries — by running the
IDENTICAL SQL text on both engines (the strongest possible dialect
parity statement: zero translation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.operators.ml_eval_suite import _HIST_SQL, _score_hist
from oroboro_dw_dbt_spark.sources.testdata import load_table


@query(
    "ml_chi_square",
    # Pearson chi-square of lang × split independence. Each cell's
    # (O·N − r·c)²/(N·r·c) is computed once over the CELL table (≤10
    # rows), rounded to 1e-9 fixed point, and summed as BIGINT — the
    # same partition-order-proof trick as ml_brier_logloss. The split
    # is deterministically entangled with lang (ascii of its first
    # letter feeds the hash), so the statistic is far from zero and a
    # regression that breaks a marginal shows up in the value.
    oracle="""
    WITH cells AS (
      SELECT lang,
             CASE WHEN (doc_id * 13 + ascii(substr(lang, 1, 1))) % 100 < 50
                  THEN 'a' ELSE 'b' END AS split,
             CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    m AS (
      SELECT lang, split, o,
             sum(o) OVER (PARTITION BY lang) AS r,
             sum(o) OVER (PARTITION BY split) AS c,
             sum(o) OVER () AS n
      FROM cells
    ),
    t AS (
      SELECT lang, split, n,
             CAST(round(
               CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE)
                 / (n * r * c) * 1e9, 0) AS BIGINT) AS term_scaled
      FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST((count(DISTINCT lang) - 1) * (count(DISTINCT split) - 1)
                AS BIGINT) AS dof,
           CAST(sum(term_scaled) AS DOUBLE) / 1e9 AS chi2
    FROM t
    """,
    survey_ref="beyond-reference: chi-square independence test over "
    "categorical cells — drift detection for re-ingested corpora",
)
def ml_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for lang × split independence.

    Scale: one combining groupBy collapses the corpus to |langs|·2
    cells; marginals come from windows over that cell table (bytes).
    The statistic is a 1e-9 fixed-point BIGINT sum — identical under
    any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        (F.col("doc_id") * 13 + F.ascii(F.substring("lang", 1, 1))) % 100
        < 50,
        "a",
    ).otherwise("b")
    cells = (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    all_rows = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = cells.select(
        "lang",
        "split",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("r"),
        F.sum("o").over(Window.partitionBy("split")).alias("c"),
        F.sum("o").over(all_rows).alias("n"),
    )
    dev = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    term = (dev * dev).cast("double") / (
        F.col("n") * F.col("r") * F.col("c")
    )
    t = m.select(
        "lang",
        "split",
        "n",
        F.round(term * 1e9, 0).cast("bigint").alias("term_scaled"),
    )
    return t.agg(
        F.max("n").alias("n"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("split") - 1)
        ).alias("dof"),
        (F.sum("term_scaled").cast("double") / 1e9).alias("chi2"),
    )


@query(
    "ml_ks_drift",
    # Two-sample KS between the positive and negative score
    # distributions: D = max|F_pos − F_neg| = max|cum_pos·N − cum_neg·P|
    # / (P·N) — the max runs over EXACT integers (cross-multiplied
    # CDFs), so the statistic is one division of a BIGINT max.
    oracle=f"""
    WITH hist AS ({_HIST_SQL}),
    cum AS (
      SELECT sx,
             sum(pos) OVER (ORDER BY sx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
             sum(neg) OVER (ORDER BY sx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cneg,
             sum(pos) OVER () AS p,
             sum(neg) OVER () AS nn
      FROM hist
    )
    SELECT CAST(max(p) AS BIGINT) AS n_pos,
           CAST(max(nn) AS BIGINT) AS n_neg,
           CAST(max(abs(cpos * nn - cneg * p)) AS BIGINT) AS d_scaled,
           CAST(max(abs(cpos * nn - cneg * p)) AS DOUBLE)
             / (max(p) * max(nn)) AS ks_d
    FROM cum
    """,
    survey_ref="beyond-reference: two-sample Kolmogorov-Smirnov "
    "statistic via cross-multiplied integer CDFs — exact "
    "continuous-drift detection without a global sort of raw rows",
)
def ml_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between class-conditional scores.

    Scale: the ordered CDF work runs over the ≤1000-row score
    histogram; cross-multiplying by the opposite class's total keeps
    every compared quantity BIGINT (overflow only past ~9e18 = P·N
    products of ~3e9 rows per class — decimal-cast there)."""
    hist = _score_hist(spark, sf_dir)
    w_cum = Window.orderBy("sx").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        F.sum("pos").over(w_cum).alias("cpos"),
        F.sum("neg").over(w_cum).alias("cneg"),
        F.sum("pos").over(w_all).alias("p"),
        F.sum("neg").over(w_all).alias("nn"),
    )
    diff = F.abs(F.col("cpos") * F.col("nn") - F.col("cneg") * F.col("p"))
    return cum.agg(
        F.max("p").alias("n_pos"),
        F.max("nn").alias("n_neg"),
        F.max(diff).alias("d_scaled"),
        (
            F.max(diff).cast("double") / (F.max("p") * F.max("nn"))
        ).alias("ks_d"),
    )


@query(
    "ml_psi_drift",
    # PSI between two deterministic halves of the corpus over 5 score
    # bins, with +1 Laplace smoothing so empty cells stay finite:
    # p = (cnt_a+1)/(n_a+5). Each bin's (p−q)·ln(p/q) rounds to 1e-9
    # fixed point (5 BIGINT terms — partition-order-independent).
    oracle="""
    WITH s AS (
      SELECT ((vec_id * 2654435761 + 40503) % 100000) % 600
               + (label % 2) * 400 AS sx,
             ((vec_id * 2654435761 + 40503) // 64) % 2 AS grp
      FROM embeddings
    ),
    bins AS (
      SELECT sx // 200 AS bin,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM s GROUP BY sx // 200
    ),
    t AS (
      SELECT bin, ca, cb,
             sum(ca) OVER () AS na, sum(cb) OVER () AS nb
      FROM bins
    ),
    terms AS (
      SELECT na, nb,
             CAST(round(
               (CAST(ca + 1 AS DOUBLE) / (na + 5)
                  - CAST(cb + 1 AS DOUBLE) / (nb + 5))
               * ln((CAST(ca + 1 AS DOUBLE) / (na + 5))
                    / (CAST(cb + 1 AS DOUBLE) / (nb + 5)))
               * 1e9, 0) AS BIGINT) AS term_scaled
      FROM t
    )
    SELECT CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(term_scaled) AS DOUBLE) / 1e9 AS psi
    FROM terms
    """,
    survey_ref="beyond-reference: population stability index over "
    "smoothed score bins — the standard model-monitoring drift gauge",
)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between two corpus halves over 5 score bins (+1 smoothing).

    Scale: one combining groupBy to 5 bins; smoothing keeps the
    logarithm finite when a bin empties on one side, so a skewed
    re-ingest degrades the metric instead of crashing it."""
    emb = load_table(spark, sf_dir, "embeddings")
    y = F.col("label") % 2
    h = (F.col("vec_id") * F.lit(2654435761) + F.lit(40503)) % 100000
    s = emb.select(
        ((h % 600) + y * 400).alias("sx"),
        (
            F.expr("(vec_id * 2654435761 + 40503) div 64") % 2
        ).alias("grp"),
    )
    bins = s.groupBy(F.expr("sx div 200").alias("bin")).agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("cb"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = bins.select(
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + 5)
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + 5)
    terms = t.select(
        "na",
        "nb",
        F.round((p - q) * F.log(p / q) * 1e9, 0)
        .cast("bigint")
        .alias("term_scaled"),
    )
    return terms.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins"),
        (F.sum("term_scaled").cast("double") / 1e9).alias("psi"),
    )


# ---------------------------------------------------------------------------
# SQL surface parity: the SAME SQL text runs on both engines.
# ---------------------------------------------------------------------------
_RECURSIVE_SQL = """
    WITH RECURSIVE e AS (
      SELECT s_suppkey AS child, s_suppkey {div} 4 AS parent
      FROM supplier WHERE s_suppkey > 0
    ),
    r(k, depth) AS (
      SELECT child, 0 FROM e WHERE parent = 0
      UNION ALL
      SELECT e.child, r.depth + 1 FROM r JOIN e ON e.parent = r.k
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_keys
    FROM r GROUP BY depth
"""


@query(
    "sql_recursive_cte",
    # identical text modulo the integer-division spelling (Spark `div`,
    # DuckDB `//`) — certified cell-for-cell
    oracle=_RECURSIVE_SQL.format(div="//"),
    survey_ref="beyond-reference: WITH RECURSIVE traversal of a "
    "supplier-key hierarchy — the declarative twin of gr_bfs_distances "
    "/ gr_hierarchy_closure, certifying Spark 4's recursive-CTE "
    "surface against another engine's",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-depth census of a recursive hierarchy, via WITH RECURSIVE.

    Scale: Spark executes the recursion as an iterative union of join
    steps — one shuffle per level, O(depth) levels (depth is log₄ of
    the key space here). For unbounded-depth production graphs the
    hand-rolled twins (ops/graph.py) add lineage checkpointing and a
    convergence guard; this entry certifies the declarative surface."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_RECURSIVE_SQL.format(div="div"))


_LATERAL_SQL = """
    SELECT n.n_nationkey, l.s_suppkey,
           CAST(l.s_acctbal AS DOUBLE) AS bal
    FROM nation n,
    LATERAL (
      SELECT s_suppkey, s_acctbal FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_suppkey LIMIT 2
    ) l
"""


@query(
    "sql_lateral_topn",
    # IDENTICAL SQL text on both engines
    oracle=_LATERAL_SQL,
    survey_ref="beyond-reference: correlated LATERAL subquery with "
    "per-row ORDER BY/LIMIT — top-n-per-group in its declarative form "
    "(the QUALIFY/window rewrite is w1_top1_per_group)",
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 suppliers by balance per nation via LATERAL, pinned ties.

    Scale: Catalyst decorrelates the lateral into a ranked window
    (WindowGroupLimit caps per-group sort output) — same physical
    shape as the QUALIFY rewrite, now certified from the LATERAL
    spelling."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_LATERAL_SQL)


_BINNED_SQL = """
      SELECT date_trunc('hour', ts) AS win_start,
             least(CAST(round(CAST(value AS DECIMAL(12,4)) * 100, 0)
                        AS BIGINT) // 10000, 4) AS bin
      FROM events
"""


@query(
    "st_drift_monitor",
    # The Spark side runs a REAL stream (file source → 1-hour window ×
    # 5 exact value bins → complete-mode sink); the settled histogram
    # state then joins the broadcast reference distribution for a
    # per-window PSI (same +1-smoothed fixed-point form as
    # ml_psi_drift). The oracle restates ALL of it as batch SQL — a
    # hash match certifies streaming-state == batch histogram AND the
    # drift math on top of it.
    oracle=f"""
    WITH binned AS ({_BINNED_SQL}),
    wb AS (
      SELECT win_start, bin, CAST(count(*) AS BIGINT) AS cnt
      FROM binned GROUP BY 1, 2
    ),
    ref AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS rcnt,
             sum(count(*)) OVER () AS rn
      FROM binned GROUP BY 1
    ),
    w AS (
      SELECT win_start, bin, cnt,
             sum(cnt) OVER (PARTITION BY win_start) AS wn
      FROM wb
    ),
    terms AS (
      SELECT win_start, wn,
             CAST(round(
               (CAST(cnt + 1 AS DOUBLE) / (wn + 5)
                  - CAST(rcnt + 1 AS DOUBLE) / (rn + 5))
               * ln((CAST(cnt + 1 AS DOUBLE) / (wn + 5))
                    / (CAST(rcnt + 1 AS DOUBLE) / (rn + 5)))
               * 1e9, 0) AS BIGINT) AS t
      FROM w JOIN ref USING (bin)
    )
    SELECT win_start, CAST(max(wn) AS BIGINT) AS n_window,
           CAST(sum(t) AS DOUBLE) / 1e9 AS psi
    FROM terms GROUP BY win_start
    """,
    survey_ref="beyond-reference: streaming drift monitor — windowed "
    "value-histogram state maintained by a real Structured Streaming "
    "query, per-window PSI against the reference distribution derived "
    "from the settled state",
)
def st_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour PSI of the event-value distribution vs the corpus.

    Scale: the stream maintains |windows|·5 rows of state (the
    histogram), not raw events; the reference is a 5-row broadcast;
    the PSI derivation touches only the settled state. In production
    this runs append-mode with a watermark so closed windows emit and
    evict — the complete-mode AvailableNow form here is what makes it
    oracle-checkable."""
    from oroboro_dw_dbt_spark.streaming.jobs import (
        stream_binned_value_counts,
    )

    sink = stream_binned_value_counts(spark, sf_dir)  # (w, bin, cnt)
    wb = sink.select(
        F.col("w.start").alias("win_start"), "bin", "cnt"
    )
    ev = load_table(spark, sf_dir, "events")
    bin_col = F.least(
        F.expr(
            "CAST(round(CAST(value AS DECIMAL(12,4)) * 100, 0) AS BIGINT)"
            " div 10000"
        ),
        F.lit(4),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ref = (
        ev.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("rcnt"))
        .withColumn("rn", F.sum("rcnt").over(w_all))
    )
    w_win = Window.partitionBy("win_start")
    joined = (
        wb.withColumn("wn", F.sum("cnt").over(w_win))
        .join(F.broadcast(ref), "bin")
    )
    p = (F.col("cnt") + 1).cast("double") / (F.col("wn") + 5)
    q = (F.col("rcnt") + 1).cast("double") / (F.col("rn") + 5)
    terms = joined.select(
        "win_start",
        "wn",
        F.round((p - q) * F.log(p / q) * 1e9, 0)
        .cast("bigint")
        .alias("t"),
    )
    return terms.groupBy("win_start").agg(
        F.max("wn").alias("n_window"),
        (F.sum("t").cast("double") / 1e9).alias("psi"),
    )
