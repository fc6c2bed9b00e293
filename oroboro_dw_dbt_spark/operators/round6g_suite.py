"""Round-6 eleventh wave: BI period comparisons, co-purchase graph
projection, and PMI collocations.

- ``ts_period_over_period`` — day-over-day / week-over-week revenue
  deltas via day-offset equi-joins (gap-safe: a missing prior day
  yields NULL, never a silently wrong lag). Revenue goes through
  exact integer cents BEFORE any aggregation: the source column is
  DOUBLE, and a float sum is partition-order-dependent — the one
  nondeterminism this catalog never tolerates.
- ``gr_bipartite_projection`` — the recsys-prep shape: project the
  customer×part bipartite graph onto part–part co-purchase edges.
  The quadratic hazard (one whale customer → |parts|² pairs) is
  capped structurally: each customer contributes only their top-10
  parts (by line count, tie-broken), so pair fan-out is ≤ C(10,2)
  per customer regardless of skew — the cap IS the operator contract,
  stated in the output, not a silent truncation.
- ``ml_cooccurrence_pmi`` — pointwise mutual information over
  adjacent-token bigrams (the collocation/embedding-prep statistic):
  all counts are exact BIGINTs from two aggregates, one ln() at the
  end, nano fixed-point, min-support 5, top-20 with full tie-break.

House rules (operators/catalog.py) as everywhere. The reference
(3 BigQuery models) has no analog; SURVEY §6 scopes these families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

_EPOCH = "1992-01-01"
_BP_TOP_PARTS = 10
_BP_TOP_EDGES = 20
_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@query(
    "ts_period_over_period",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '{_EPOCH}', CAST(o_orderdate AS DATE))
               AS day_idx,
             CAST(sum(CAST(round(CAST(o_totalprice AS DECIMAL(14,4)) * 100, 0)
                           AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1
    )
    SELECT c.day_idx, c.revenue_cents,
           CAST(round((c.revenue_cents - d1.revenue_cents) * 1000000.0
                 / d1.revenue_cents, 0) AS BIGINT) AS dod_micro,
           CAST(round((c.revenue_cents - d7.revenue_cents) * 1000000.0
                 / d7.revenue_cents, 0) AS BIGINT) AS wow_micro
    FROM daily c
    LEFT JOIN daily d1 ON d1.day_idx = c.day_idx - 1
    LEFT JOIN daily d7 ON d7.day_idx = c.day_idx - 7
    """,
    survey_ref="beyond-reference: day-over-day / week-over-week revenue "
    "deltas — gap-safe day-offset joins, exact integer cents",
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day revenue with DoD and WoW percent change (micro).

    Scale: the daily rollup is the only corpus-wide shuffle (fully
    partial-aggregating on integer cents); both period joins run on
    the |days|-row result — KB forever. A LAG window would be one
    sort cheaper but silently lags across gaps; the explicit offset
    join is the correct-by-construction spelling."""
    cents = (
        F.round(F.col("o_totalprice").cast("decimal(14,4)") * 100, 0)
        .cast("long")
    )
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit(_EPOCH))).alias(
                "day_idx"
            ),
            cents.alias("cents"),
        )
        .groupBy("day_idx")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    c, d1, d7 = daily.alias("c"), daily.alias("d1"), daily.alias("d7")

    def pct(cur, prev):
        return F.round(
            (cur - prev) * 1000000.0 / prev, 0
        ).cast("long")

    return (
        c.join(d1, F.col("d1.day_idx") == F.col("c.day_idx") - 1, "left")
        .join(d7, F.col("d7.day_idx") == F.col("c.day_idx") - 7, "left")
        .select(
            F.col("c.day_idx").alias("day_idx"),
            F.col("c.revenue_cents").alias("revenue_cents"),
            pct(F.col("c.revenue_cents"), F.col("d1.revenue_cents")).alias(
                "dod_micro"
            ),
            pct(F.col("c.revenue_cents"), F.col("d7.revenue_cents")).alias(
                "wow_micro"
            ),
        )
    )


@query(
    "gr_bipartite_projection",
    oracle=f"""
    WITH cp AS (
      SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    capped AS (
      SELECT custkey, partkey FROM (
        SELECT *, row_number() OVER (
          PARTITION BY custkey ORDER BY n_lines DESC, partkey) AS rk
        FROM cp
      ) WHERE rk <= {_BP_TOP_PARTS}
    ),
    edges AS (
      SELECT a.partkey AS part_a, b.partkey AS part_b,
             CAST(count(*) AS BIGINT) AS weight
      FROM capped a JOIN capped b
        ON b.custkey = a.custkey AND b.partkey > a.partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, weight, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        ORDER BY weight DESC, part_a, part_b) AS INT) AS rnk
      FROM edges
    ) WHERE rnk <= {_BP_TOP_EDGES}
    """,
    survey_ref="beyond-reference: bipartite co-purchase projection with "
    "a structural per-customer top-10 cap — pair fan-out ≤ C(10,2) "
    "under any skew",
)
def gr_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased part pairs, whale-proof.

    The naive projection explodes quadratically on a heavy customer;
    capping each customer to their top-10 parts (window over the
    pre-aggregated customer×part table, NOT the raw lines) bounds
    every customer's contribution to 45 pairs. The self-join is a
    custkey equi-join over the capped table — at 100 TB this is
    |customers|×45 rows, shuffled once on custkey, then one combining
    groupBy on the pair key."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey")
        )
        .agg(F.count("*").alias("n_lines"))
    )
    rk = F.row_number().over(
        Window.partitionBy("custkey").orderBy(F.desc("n_lines"), "partkey")
    )
    capped = (
        cp.withColumn("rk", rk).where(F.col("rk") <= _BP_TOP_PARTS)
        .select("custkey", "partkey")
    )
    a, b = capped.alias("a"), capped.alias("b")
    edges = (
        a.join(
            b,
            (F.col("b.custkey") == F.col("a.custkey"))
            & (F.col("b.partkey") > F.col("a.partkey")),
        )
        .groupBy(
            F.col("a.partkey").alias("part_a"), F.col("b.partkey").alias("part_b")
        )
        .agg(F.count("*").alias("weight"))
    )
    w = Window.orderBy(F.desc("weight"), "part_a", "part_b")
    return (
        edges.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _BP_TOP_EDGES)
        .select("part_a", "part_b", "weight", "rnk")
    )


@query(
    "ml_cooccurrence_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS L FROM documents
    ),
    uni AS (
      SELECT L[i] AS t, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(range(1, len(L) + 1)) AS u(i)
      WHERE L[i] <> '' GROUP BY 1
    ),
    bi AS (
      SELECT L[i] AS a, L[i + 1] AS b, CAST(count(*) AS BIGINT) AS c_ab
      FROM toks, unnest(range(1, len(L))) AS u(i)
      WHERE L[i] <> '' AND L[i + 1] <> '' GROUP BY 1, 2
    ),
    tot AS (
      SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_uni,
             (SELECT CAST(sum(c_ab) AS BIGINT) FROM bi) AS n_bi
    )
    SELECT a, b, c_ab, pmi_nano, rnk FROM (
      SELECT bi.a, bi.b, bi.c_ab,
             CAST(round(ln(CAST(bi.c_ab AS DOUBLE) * tot.n_uni * tot.n_uni
                   / (tot.n_bi * ua.c * ub.c)) * 1e9, 0) AS BIGINT) AS pmi_nano,
             CAST(row_number() OVER (ORDER BY
               round(ln(CAST(bi.c_ab AS DOUBLE) * tot.n_uni * tot.n_uni
                   / (tot.n_bi * ua.c * ub.c)) * 1e9, 0) DESC,
               bi.a, bi.b) AS INT) AS rnk
      FROM bi JOIN uni ua ON ua.t = bi.a JOIN uni ub ON ub.t = bi.b
      CROSS JOIN tot
      WHERE bi.c_ab >= {_PMI_MIN_COUNT}
    ) WHERE rnk <= {_PMI_TOPK}
    """,
    survey_ref="beyond-reference: PMI collocations over adjacent-token "
    "bigrams — exact BIGINT counts, one ln(), nano fixed-point, "
    "ranked on the rounded value",
)
def ml_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI (min support 5).

    pmi = ln(c_ab · N_u² / (N_b · c_a · c_b)) — every operand an
    exact integer aggregate, so partitioning cannot move the value;
    ranking runs on the ROUNDED fixed-point (a last-ulp libm
    difference cannot reorder). Scale: unigram and bigram censuses
    are combining groupBys over the token stream; the PMI join hits
    only bigrams past min-support."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " ").alias("L")
    )
    toks = d.select(F.explode("L").alias("t")).where(F.col("t") != "")
    uni = toks.groupBy("t").agg(F.count("*").alias("c"))
    bi = (
        d.select(
            F.explode(
                F.arrays_zip(
                    F.slice("L", 1, F.size("L") - 1).alias("a"),
                    F.slice("L", 2, F.size("L") - 1).alias("b"),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where((F.col("a") != "") & (F.col("b") != ""))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
    )
    tot = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        F.broadcast(bi.agg(F.sum("c_ab").alias("n_bi")))
    )
    ua = uni.select(F.col("t").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("t").alias("b"), F.col("c").alias("cb"))
    pmi_nano = F.round(
        F.log(
            F.col("c_ab").cast("double")
            * F.col("n_uni")
            * F.col("n_uni")
            / (F.col("n_bi") * F.col("ca") * F.col("cb"))
        )
        * 1e9,
        0,
    ).cast("long")
    scored = (
        bi.where(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", "c_ab", pmi_nano.alias("pmi_nano"))
    )
    w = Window.orderBy(F.desc("pmi_nano"), "a", "b")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _PMI_TOPK)
        .select("a", "b", "c_ab", "pmi_nano", "rnk")
    )
