"""Reference-surface relational operators over the testdata tables.

One catalog entry per SURVEY §2 inventory row, re-expressed on the
TPC-H-ish synthetic schema so the driver can hash-compare against
DuckDB. Design rules applied throughout (see catalog.py):

- monetary aggregates go through DECIMAL so the sum is exact in both
  engines, then CAST to DOUBLE (deterministic) — never a float sum
  whose value depends on accumulation order;
- COUNT-family results are CAST to BIGINT on both sides (DuckDB's
  ``sum(int)`` is HUGEINT, Spark's is BIGINT);
- every window has a total-order tiebreak (the reference's W4 has none
  and is nondeterministic — SURVEY §2.5; we pin it);
- booleans are CAST to INT, year()/month() results to BIGINT.

Scale notes per query are inline; the common ones: dimension joins
(nation/region/part-brands) broadcast under AQE; aggregations are
partial+final hash aggs (map-side combine); all scans prune columns and
push filters into Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.functions import st_distance_meters, st_distance_meters_geodesic
from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

PRICE_DEC = "decimal(12,4)"  # prices < 1e8
RATE_DEC = "decimal(8,4)"    # discount/tax rates ~1.0
# product: (12,4)*(8,4)*(8,4) = decimal(30,12) — exact, under the 38 cap in
# BOTH engines. The decimal sum is then ROUNDed to scale 2 BEFORE casting to
# double: high-scale decimal→double is not correctly rounded in every engine
# (observed 1-ulp drift in DuckDB), but a scale-2 decimal fits 2^53 and
# converts exactly the same everywhere.


# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1-style pricing summary (the flagship query).
# SURVEY refs: P1 projection, P6 const filter, A-aggs, O1 sort.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(1 - l_discount AS DECIMAL(8,4))
               * CAST(1 + l_tax AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_charge,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="§2.2 P1/P6, §2.4 aggs, §2.6 O1",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: single scan → partial hash agg per partition → 6-group final
    # agg. Filter + 6-column pruning push into the Parquet scan.
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(PRICE_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(RATE_DEC)
    tax = (F.lit(1) + F.col("l_tax")).cast(RATE_DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(PRICE_DEC)), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * disc), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * disc * tax), 2).cast("double").alias("sum_charge"),
            (
                F.round(F.sum(F.col("l_quantity").cast(PRICE_DEC)), 2).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Join chain + top-k: TPC-H Q3-style. SURVEY refs: J9/J10 chains, W top-k.
# ---------------------------------------------------------------------------
@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT
      l_orderkey,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue,
      CAST(o_orderdate AS DATE) AS orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey_ref="§2.3 J9 chain, §2.4 agg, §2.6 top-k",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: customer filter prunes before the join (Catalyst pushes it
    # below); orders⋈lineitem shuffles on orderkey; the LIMIT is a
    # TakeOrderedAndProject — no global sort materialization.
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast(PRICE_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(RATE_DEC)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(price * disc), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J1: LEFT join with fan-out (ref: user_base.sql:57 — users × API keys).
# ---------------------------------------------------------------------------
@query(
    "j1_left_fanout",
    oracle="""
    SELECT
      c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
      CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    survey_ref="§2.3 J1 (left fan-out)",
)
def j1_left_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The fan-out is the point: customers with k orders yield k rows,
    # customers with none survive with NULLs (n_rows > n_orders).
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
            F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# J7: equi-join on a COMPUTED key + residual predicate
# (ref: stacked_users_partners.sql:57 — lower(trim(email)) join).
# ---------------------------------------------------------------------------
@query(
    "j7_computed_key_join",
    oracle="""
    WITH brand_dim AS (
      SELECT lower(trim(p_brand)) AS brand_key,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY lower(trim(p_brand))
    )
    SELECT p_partkey, brand_key, n_parts
    FROM part
    JOIN brand_dim ON lower(trim(p_brand)) = brand_key AND p_size > 25
    """,
    survey_ref="§2.3 J7 (computed key + residual), §2.8 F1/F2",
)
def j7_computed_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both join inputs compute the key before the exchange — Catalyst
    # hashes the derived column; residual p_size > 25 stays a join filter.
    # brand_dim is tiny → broadcast.
    part = load_table(spark, sf_dir, "part")
    brand_dim = (
        part.groupBy(F.lower(F.trim(F.col("p_brand"))).alias("brand_key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    return part.join(
        F.broadcast(brand_dim),
        (F.lower(F.trim(part.p_brand)) == brand_dim.brand_key) & (part.p_size > 25),
    ).select("p_partkey", "brand_key", "n_parts")


# ---------------------------------------------------------------------------
# J9/J11: chained dimension joins (ref: stacked_users_partners.sql:15-19,
# locations_clean.sql:120-134 — 5/6-way assemblies).
# ---------------------------------------------------------------------------
@query(
    "j9_dim_chain_rollup",
    oracle="""
    SELECT
      r_name,
      n_name,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    survey_ref="§2.3 J9-J11 chains",
)
def j9_dim_chain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one shuffle join (orders⋈lineitem on orderkey); customer
    # scales WITH the fact side (~15 M rows at sf100) so it gets NO
    # broadcast hint — AQE broadcasts it at small SF and shuffle-joins it
    # at scale. Only the true dims (nation 25 rows, region 5) are hinted.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    price = F.col("l_extendedprice").cast(PRICE_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(RATE_DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(price * disc), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# A1: GROUP BY + HAVING COUNT(DISTINCT) (ref: locations_clean.sql:30-37).
# ---------------------------------------------------------------------------
@query(
    "a1_having_count_distinct",
    oracle="""
    SELECT o_custkey, CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) > 2
    """,
    survey_ref="§2.4 A1",
)
def a1_having_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").cast("bigint").alias("n_priorities"))
        .filter(F.col("n_priorities") > 2)
    )


# ---------------------------------------------------------------------------
# A2: dedup via group-by-all-columns (ref: stacked_users_partners.sql:86-98
# uses positional GROUP BY 1..9 as SELECT DISTINCT).
# ---------------------------------------------------------------------------
@query(
    "a2_groupby_dedup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority
    FROM orders
    GROUP BY 1, 2
    """,
    survey_ref="§2.4 A2/A3 (positional group-by dedup)",
)
def a2_groupby_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dropDuplicates == GROUP BY all-cols; collapses fan-out like the
    # reference's invite-code dedup. Partial dedup happens map-side.
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").dropDuplicates()


# ---------------------------------------------------------------------------
# W1/W2/W3: top-1 per group via row_number (ref: locations_clean.sql:74-77,
# :83, :126-134) — the QUALIFY rewrite.
# ---------------------------------------------------------------------------
@query(
    "w1_top1_per_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber
             ) AS rn
      FROM lineitem
    ) t
    WHERE rn = 1
    """,
    survey_ref="§2.5 W1-W3, §2.2 P7 (QUALIFY rewrite)",
)
def w1_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle on the partition key; deterministic tiebreak on
    # l_linenumber (the reference's W4 omits this — SURVEY §2.5 ⚠).
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# W4: best-scored row per group (ref: locations_clean.sql:139-156 —
# completeness score + row_number desc), with the tiebreak pinned.
# ---------------------------------------------------------------------------
@query(
    "w4_best_score_per_group",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id
             ) AS row_rank
      FROM documents
    ) t
    WHERE row_rank = 1
    """,
    survey_ref="§2.5 W4 (deterministic tiebreak added)",
)
def w4_best_score_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("row_rank", F.row_number().over(w))
        .filter(F.col("row_rank") == 1)
        .drop("row_rank")
    )


# ---------------------------------------------------------------------------
# U1/U2/U3: UNION ALL with typed NULL literals
# (ref: stacked_users_partners.sql:21,:42,:64 and the `null as educator_id`
# literals at :4,:46,:68 that force explicit casts in DataFrame code).
# ---------------------------------------------------------------------------
@query(
    "u2_union_typed_nulls",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS kind,
           c_acctbal AS acctbal, CAST(NULL AS INTEGER) AS size
    FROM customer
    UNION ALL
    SELECT p_partkey, p_name, 'part',
           CAST(NULL AS DOUBLE), p_size
    FROM part
    UNION ALL
    SELECT s_suppkey, s_name, 'supplier',
           s_acctbal, CAST(NULL AS INTEGER)
    FROM supplier
    """,
    survey_ref="§2.7 U1-U3 (typed-null union)",
)
def u2_union_typed_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit(None).cast("int").alias("size"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("name"),
        F.lit("part").alias("kind"),
        F.lit(None).cast("double").alias("acctbal"),
        F.col("p_size").alias("size"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit(None).cast("int").alias("size"),
    )
    return cust.unionByName(part).unionByName(supp)


# ---------------------------------------------------------------------------
# P3/P4/P5: star-except projection, IN-list and NOT NULL/!= filter chains
# (ref: locations_clean.sql:127 `* EXCEPT(rn)`, :14 IN-list, :52-55).
# ---------------------------------------------------------------------------
@query(
    "p_filter_suite",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang IN ('en', 'de', 'fr')
      AND n_chars IS NOT NULL
      AND n_chars > 200
      AND source != 'src0'
    """,
    survey_ref="§2.2 P3/P4/P5",
)
def p_filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `.drop('text')` is the DataFrame spelling of `* EXCEPT(text)`;
    # the whole conjunction pushes into the Parquet scan (PushedFilters).
    docs = load_table(spark, sf_dir, "documents")
    return docs.drop("text").filter(
        F.col("lang").isin("en", "de", "fr")
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") > 200)
        & (F.col("source") != "src0")
    )


# ---------------------------------------------------------------------------
# G2: geodesic distance + threshold (ref: locations_clean.sql:48,:63 —
# st_distance/1609.34 and the 10-mile cut).
# ---------------------------------------------------------------------------
def _synthetic_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact small-integer multiples so both engines compute bit-identical
    # inputs; shared by g2 (haversine) and g3 (geodesic).
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.col("n_nationkey").alias("k"),
        (F.col("n_nationkey") * 3.0 - 37.0).alias("lat"),
        (F.col("n_nationkey") * 7.0 - 80.0).alias("lon"),
    )


@query(
    "g2_haversine_pairs",
    oracle="""
    WITH pts AS (
      SELECT n_nationkey AS k,
             n_nationkey * 3.0 - 37.0 AS lat,
             n_nationkey * 7.0 - 80.0 AS lon
      FROM nation
    )
    SELECT
      a.k AS from_k, b.k AS to_k,
      ROUND(2 * 6371008.8 * ASIN(SQRT(
          POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
          + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
          * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
      )) / 1609.34, 3) AS distance_miles,
      CAST(2 * 6371008.8 * ASIN(SQRT(
          POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
          + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
          * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
      )) / 1609.34 > 500 AS INT) AS far_flag
    FROM pts a JOIN pts b ON a.k < b.k
    """,
    survey_ref="§2.10 G1/G2, §2.9 M1/M2",
)
def g2_haversine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure Column arithmetic — stays in whole-stage codegen, no UDF;
    # output rounded to 3 decimals.
    pts = _synthetic_points(spark, sf_dir)
    a = pts.alias("a")
    b = pts.alias("b")
    dist_miles = st_distance_meters(
        F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
    ) / F.lit(1609.34)
    return (
        a.join(b, F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("from_k"),
            F.col("b.k").alias("to_k"),
            F.round(dist_miles, 3).alias("distance_miles"),
            (dist_miles > 500).cast("int").alias("far_flag"),
        )
    )


# ---------------------------------------------------------------------------
# G3: ellipsoidal (Lambert) distance — the accuracy fallback for business
# rules sitting on a hard distance threshold (ref: locations_clean.sql:63,
# the 10-mile cut, where haversine's 0.6% sphere error can flip rows).
# Oracle spells out the identical formula in SQL so both engines run the
# same double arithmetic; miles rounded to 3 decimals.
# ---------------------------------------------------------------------------
@query(
    "g3_geodesic_pairs",
    oracle="""
    WITH pts AS (
      SELECT n_nationkey AS k,
             n_nationkey * 3.0 - 37.0 AS lat,
             n_nationkey * 7.0 - 80.0 AS lon
      FROM nation
    ),
    red AS (
      SELECT a.k AS from_k, b.k AS to_k,
             ATAN((1 - 1.0/298.257223563) * TAN(RADIANS(a.lat))) AS b1,
             ATAN((1 - 1.0/298.257223563) * TAN(RADIANS(b.lat))) AS b2,
             RADIANS(b.lon - a.lon) AS dl
      FROM pts a JOIN pts b ON a.k < b.k
    ),
    cen AS (
      SELECT from_k, to_k, b1, b2,
             2 * ASIN(LEAST(1.0, SQRT(
               POW(SIN((b2 - b1) / 2), 2)
               + COS(b1) * COS(b2) * POW(SIN(dl / 2), 2)
             ))) AS sigma
      FROM red
    ),
    geo AS (
      SELECT from_k, to_k,
             CASE WHEN sigma = 0 THEN 0.0 ELSE
               6378137.0 * (sigma - (1.0/298.257223563) / 2 * (
                 (sigma - SIN(sigma)) * POW(SIN((b1 + b2) / 2), 2)
                   * POW(COS((b2 - b1) / 2), 2) / POW(COS(sigma / 2), 2)
                 + (sigma + SIN(sigma)) * POW(COS((b1 + b2) / 2), 2)
                   * POW(SIN((b2 - b1) / 2), 2) / POW(SIN(sigma / 2), 2)
               ))
             END AS meters
      FROM cen
    )
    SELECT from_k, to_k,
           ROUND(meters / 1609.34, 3) AS geodesic_miles,
           CAST(meters / 1609.34 > 500 AS INT) AS far_flag
    FROM geo
    """,
    survey_ref="§2.10 G1/G2 (accuracy fallback)",
)
def g3_geodesic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _synthetic_points(spark, sf_dir)
    a = pts.alias("a")
    b = pts.alias("b")
    dist_miles = st_distance_meters_geodesic(
        F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
    ) / F.lit(1609.34)
    return (
        a.join(b, F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias("from_k"),
            F.col("b.k").alias("to_k"),
            F.round(dist_miles, 3).alias("geodesic_miles"),
            (dist_miles > 500).cast("int").alias("far_flag"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-shape: 6-way join with region filter. The multiway-join stress
# test: dims (region→nation→supplier) broadcast under AQE; the one real
# shuffle is lineitem⋈orders on orderkey; the c_nationkey = s_nationkey
# residual rides the existing join, no extra exchange.
# ---------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    survey_ref="§2.3 join chains stress (TPC-H Q5 shape): 6-way join, "
    "dim broadcast, residual equality on nationkey",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast(PRICE_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(RATE_DEC)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(price * disc), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18-shape: aggregate-below-join. The pre-aggregation pattern: the
# HAVING filter runs on lineitem's own grouping FIRST (map-side partial
# agg), so only qualifying orderkeys (a tiny set) reach the join — the
# alternative (join first, filter later) shuffles the whole fact twice.
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 200
    )
    SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    survey_ref="§2.4 agg + §2.3 join (TPC-H Q18 shape): HAVING "
    "pre-aggregate below the join; top-k via TakeOrderedAndProject",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qty = F.col("l_quantity").cast(PRICE_DEC)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_sq"))
        .filter(F.col("_sq") > 200)
        .select(
            "l_orderkey", F.round(F.col("_sq"), 2).cast("double").alias("total_qty")
        )
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
