"""Catalog entries widening the relational surface beyond the
reference: temporal joins (as-of, bucketed range), analytic windows
(lead/lag/frames), set operations, rollup, and pivot.

The reference uses none of these (SURVEY §2.12 absent-list), but a user
migrating real warehouse workloads expects them; each is expressed as a
single declarative plan and oracle-checked against DuckDB (which has
native ASOF JOIN — the as-of entry's oracle — and BETWEEN joins for the
range entry)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.ops import asof_join, bucketed_range_join
from oroboro_dw_dbt_spark.sources.testdata import load_table


@query(
    "tj_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    survey_ref="beyond-reference: as-of join (latest prior click per "
    "purchase) — union + running last(), one shuffle, no join node",
)
def tj_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return asof_join(purchases, clicks, key="user_id")


@query(
    "tj_asof_forward",
    # DuckDB ASOF with >= is the forward direction: earliest future
    # click at-or-after each purchase
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS next_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts >= p.ts
    """,
    survey_ref="beyond-reference: forward as-of join (earliest "
    "at-or-after match — the reaction-time/next-event direction)",
)
def tj_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return asof_join(
        purchases, clicks, key="user_id", direction="forward", prefix="next_"
    )


@query(
    "tj_asof_nearest",
    # the third as-of direction: temporally NEAREST match either way,
    # ties broken toward the earlier (backward) match. Composed from
    # the two one-sided as-ofs; distances compare in exact integer
    # microseconds (epoch doubles lose ulps at 2024-scale epochs)
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT p.event_id, p.user_id, p.ts, c.ts AS prev_ts
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND c.ts <= p.ts),
    f AS (SELECT p.event_id, c.ts AS next_ts
          FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND c.ts >= p.ts)
    SELECT b.event_id, b.user_id, b.ts,
           CASE
             WHEN prev_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prev_ts
             WHEN epoch_us(b.ts) - epoch_us(prev_ts)
                  <= epoch_us(next_ts) - epoch_us(b.ts) THEN prev_ts
             ELSE next_ts
           END AS nearest_ts
    FROM b JOIN f USING (event_id)
    """,
    survey_ref="beyond-reference: nearest as-of join (closest match in "
    "either direction, tie toward backward) — composition of the two "
    "one-sided as-ofs, still no join node on the fact",
)
def tj_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest click to each purchase, either direction.

    Composed from the backward and forward as-ofs (each a union +
    running last/first over one user_id shuffle — ops/asof.py), then a
    per-event pick on exact microsecond distances. The compose join is
    on event_id between two frames that are already purchase-sized —
    at 100 TB both inherit the same user_id partitioning, and AQE
    plans the event_id join after both sides shrank to the probe
    table's cardinality. Tie-break toward the earlier match is pinned
    (SURVEY §2.5 W4's nondeterminism lesson applies to time distance
    ties too: |prev−ts| == |next−ts| happens in real clickstreams)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    back = asof_join(purchases, clicks, key="user_id").withColumnRenamed(
        "asof_ts", "prev_ts"
    )
    fwd = asof_join(
        purchases, clicks, key="user_id", direction="forward", prefix="next_"
    ).select("event_id", "next_ts")
    d_prev = F.unix_micros("ts") - F.unix_micros("prev_ts")
    d_next = F.unix_micros("next_ts") - F.unix_micros("ts")
    return back.join(fwd, "event_id").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(d_prev <= d_next, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
        .alias("nearest_ts"),
    )


@query(
    "tj_range_join",
    oracle="""
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT e.event_id) AS BIGINT) AS n_events
    FROM events e
    JOIN (SELECT ts AS lo, ts + INTERVAL 5 MINUTE AS hi
          FROM events WHERE event_type = 'error') r
      ON e.ts >= r.lo AND e.ts <= r.hi
    GROUP BY e.event_type
    """,
    survey_ref="beyond-reference: bucketed range join (points-in-"
    "intervals as equi-join on time bucket + residual, not nested loop)",
)
def tj_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
    )
    pairs = bucketed_range_join(
        ev.select("event_id", "event_type", "ts"), intervals, "ts", "lo", "hi"
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("event_id").cast("bigint").alias("n_events"),
    )


@query(
    "tj_point_in_time",
    # the feature-store lookup: each fact row joins the dimension
    # VERSION that was valid at the fact's event time. The versioned
    # dimension is derived deterministically (3 era intervals per
    # customer, feature = acctbal scaled per era) so the oracle can
    # rebuild it; every order falls in exactly one era by construction.
    oracle="""
    WITH eras AS (
      SELECT * FROM (VALUES
        (1, TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00'),
        (2, TIMESTAMP '1997-01-01 00:00:00', TIMESTAMP '1999-01-01 00:00:00'),
        (3, TIMESTAMP '1999-01-01 00:00:00', TIMESTAMP '2002-01-01 00:00:00')
      ) AS t(version, valid_from, valid_to)
    ),
    dim AS (
      SELECT c_custkey, version, valid_from, valid_to,
             CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,4)) * version, 2)
                  AS DOUBLE) AS feature
      FROM customer CROSS JOIN eras
    )
    SELECT o_orderkey, o_custkey, version, feature
    FROM orders
    JOIN dim ON c_custkey = o_custkey
            AND o_orderdate >= valid_from AND o_orderdate < valid_to
    """,
    survey_ref="beyond-reference: point-in-time (feature-store) join — "
    "fact rows join the dimension version valid at event time; the op "
    "that prevents training-serving skew in feature pipelines",
)
def tj_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order joined to the customer-feature VERSION valid at its
    order date — the point-in-time-correct lookup every feature
    pipeline needs (joining today's feature values onto historical
    facts leaks the future into training).

    Plan shape: equi-join on the entity key carries the interval
    containment as a residual — no range bucketing needed because
    versions-per-key is small (the SCD2 situation; an unkeyed interval
    join is tj_range_join's bucketed territory). At 100 TB the shuffle
    is the fact⋈dim key join; AQE broadcasts the dimension while its
    version count × entities fits. Exactly-one-match is structural
    here (eras partition the span); production guards it with the
    h_scd2_snapshot interval invariants this repo pytest-certifies."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    eras = spark.createDataFrame(
        [
            (1, "1995-01-01 00:00:00", "1997-01-01 00:00:00"),
            (2, "1997-01-01 00:00:00", "1999-01-01 00:00:00"),
            (3, "1999-01-01 00:00:00", "2002-01-01 00:00:00"),
        ],
        "version int, valid_from string, valid_to string",
    ).select(
        "version",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    dim = cust.crossJoin(F.broadcast(eras)).select(
        "c_custkey",
        "version",
        "valid_from",
        "valid_to",
        F.round(F.col("c_acctbal").cast("decimal(12,4)") * F.col("version"), 2)
        .cast("double")
        .alias("feature"),
    )
    return orders.join(
        dim,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    ).select("o_orderkey", "o_custkey", "version", "feature")


@query(
    "w_lead_lag_frames",
    oracle="""
    SELECT event_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           CAST(round(sum(CAST(value AS DECIMAL(12,4)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS rsum3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey_ref="beyond-reference: lead/lag + explicit ROWS frame "
    "(absent from the reference, SURVEY §2.12)",
)
def w_lead_lag_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(
            F.sum(F.col("value").cast("decimal(12,4)")).over(w.rowsBetween(-2, 0)), 2
        )
        .cast("double")
        .alias("rsum3"),
    )


@query(
    "set_intersect_except",
    oracle="""
    SELECT user_id, 'both' AS op FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT user_id, 'click_only' AS op FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    survey_ref="beyond-reference: INTERSECT / EXCEPT (absent-list §2.12)",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    # intersect/subtract are the DISTINCT set ops, matching SQL
    # INTERSECT / EXCEPT (exceptAll would be the multiset variant)
    return clicks.intersect(buys).withColumn("op", F.lit("both")).unionByName(
        clicks.subtract(buys).withColumn("op", F.lit("click_only"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT)
             AS grp_id,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
    """,
    survey_ref="beyond-reference: ROLLUP with grouping ids (absent-list §2.12)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.grouping_id().cast("bigint").alias("grp_id"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select("event_type", "day", "grp_id", "n")
    )


_EVENT_TYPES = ("click", "signup", "error", "view", "purchase")


@query(
    "pivot_wide",
    oracle="""
    SELECT user_id,
           {cols}
    FROM events
    GROUP BY user_id
    """.format(
        cols=",\n           ".join(
            f"CAST(count(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT) AS n_{t}"
            for t in _EVENT_TYPES
        )
    ),
    survey_ref="beyond-reference: PIVOT to wide per-entity features "
    "(explicit value list — no extra distinct pass at scale)",
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.select(
        "user_id", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# Warehouse history: SCD2 snapshot + MERGE upsert (dbt lifecycle completion)
# ---------------------------------------------------------------------------
@query(
    "h_scd2_snapshot",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current,
           CAST(row_number() OVER w2 AS INT) AS version
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey_ref="beyond-reference: dbt-snapshot-style SCD type-2 build "
    "from a change-event feed (collapse unchanged, close intervals; "
    "one shuffle, sort reused across both windows)",
)
def h_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.ops import scd2_from_events

    ev = load_table(spark, sf_dir, "events")
    return scd2_from_events(ev, key="user_id", attr="event_type")


@query(
    "h_merge_upsert",
    # fixture: target = all customers; source = every 5th customer with a
    # bumped balance (updates), every 7th≡3 shifted key (inserts), and
    # every 10th unchanged — derived IDENTICALLY on both engines
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    ),
    src AS (
      SELECT c_custkey,
             c_mktsegment,
             CAST(round(c_acctbal + 100.0, 2) AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey % 7 = 3
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey % 10 = 1
    )
    SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment
                ELSE t.c_mktsegment END AS c_mktsegment,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN s.c_custkey IS NULL THEN 'keep'
                WHEN (t.c_mktsegment IS DISTINCT FROM s.c_mktsegment)
                  OR (t.c_acctbal IS DISTINCT FROM s.c_acctbal) THEN 'update'
                ELSE 'unchanged' END AS action
    FROM tgt t FULL OUTER JOIN src s USING (c_custkey)
    """,
    survey_ref="beyond-reference: MERGE upsert decision plan — one "
    "full-outer key-equi join, insert/update/unchanged/keep, null-safe "
    "compares; no broadcast assumption (holds when both sides are huge)",
)
def h_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.ops import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    tgt = cust.select("c_custkey", "c_mktsegment", "c_acctbal")
    key = F.col("c_custkey")
    src = (
        tgt.filter(key % 5 == 0).withColumn(
            "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2).cast("double")
        )
        .unionAll(
            tgt.filter(key % 7 == 3).withColumn("c_custkey", key + 1000000)
        )
        .unionAll(tgt.filter(key % 10 == 1))
    )
    return merge_upsert(tgt, src, keys=["c_custkey"])


@query(
    "agg_cube",
    # decimal-cast sum: integer cents are order-independent, so the hash
    # cannot flake on float partial-agg ordering
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
             AS grp_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    survey_ref="beyond-reference: CUBE over status x priority with "
    "grouping ids (completes ROLLUP/CUBE/GROUPING SETS family)",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("grp_id"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "grp_id", "n", "total_price")
    )


@query(
    "w_rank_suite",
    # every ranking fn over ONE window spec (o_totalprice, o_orderkey
    # pinned total order): single sort, no per-function re-shuffle
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS INT)    AS quartile,
           round(percent_rank() OVER w, 6)     AS pct_rank,
           round(cume_dist()    OVER w, 6)     AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    survey_ref="beyond-reference: ranking-function family (rank, "
    "dense_rank, ntile, percent_rank, cume_dist) on one shared window",
)
def w_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "w_rank_twophase",
    # the SAME oracle as w_rank_suite: a hash match proves the two-phase
    # rewrite (range partition -> local row_number -> offset add) is
    # exactly the window's semantics, closing the SCALE.md
    # "single-task sort per group" caveat with certified code
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS INT)    AS quartile,
           round(percent_rank() OVER w, 6)     AS pct_rank,
           round(cume_dist()    OVER w, 6)     AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    survey_ref="beyond-reference: two-phase exact ranking — the scale "
    "rewrite of w_rank_suite (no single-task sort per group; sorts "
    "bounded by range-partition size, offsets from a KB-scale count "
    "table)",
)
def w_rank_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.ops import ranking_family

    orders = load_table(spark, sf_dir, "orders")
    return ranking_family(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        part_cols=["o_orderpriority"],
        order_cols=["o_totalprice", "o_orderkey"],
    ).select("o_orderkey", "o_orderpriority", "rnk", "drnk", "quartile", "pct_rank", "cume")


@query(
    "a_exact_percentiles",
    # exact linear-interpolation percentiles: both engines sort the group
    # and interpolate between the same two doubles — deterministic, unlike
    # a float SUM (no addition-order dependence)
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6)  AS p50,
           round(quantile_cont(l_quantity, 0.9), 6)  AS p90,
           round(quantile_cont(l_quantity, 0.99), 6) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ref="beyond-reference: exact percentiles (sort-based linear "
    "interpolation; the exact twin of sk_approx_quantiles)",
)
def a_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(q, F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(q, F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile(q, F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "a_regression_stats",
    # least-squares slope/intercept of value-vs-time per event_type with
    # EXACT arithmetic: x = epoch seconds (int), y = value micro-quantized
    # to int, all moment sums as DECIMAL(38,0) (hugeint in DuckDB) — no
    # float partial-sum ordering anywhere until the final division
    oracle="""
    WITH pts AS (
      SELECT event_type,
             -- floor(): Spark's unix_timestamp truncates sub-second
             -- fractions; a bare CAST here would round them instead
             CAST(floor(epoch(ts)) AS HUGEINT) AS x,
             CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0, 6) AS slope_micro,
           round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / n / 1000000.0, 6) AS intercept
    FROM m
    """,
    survey_ref="beyond-reference: per-group least-squares trend (exact "
    "decimal moment sums -> order-independent; one map-side-combinable "
    "aggregation)",
)
def a_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_timestamp("ts").cast("decimal(38,0)")
    y = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("decimal(38,0)")
    m = ev.select("event_type", x.alias("x"), y.alias("y")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope * 1000000.0, 6).alias("slope_micro"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / 1000000.0,
            6,
        ).alias("intercept"),
    )


@query(
    "eng_incremental_run",
    # two incremental runs: v1 loads all orders, v2 re-delivers 1999+
    # orders; merged table keeps v1 rows whose key was not re-delivered
    # and replaces the rest — the CASE below is exactly that contract
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
                THEN 'v2' ELSE 'v1' END AS batch
    FROM orders
    """,
    survey_ref="engine S4/incremental: two-run delete+insert merge by "
    "unique_key through the warehouse table path (dbt incremental "
    "lifecycle, driver-certified)",
)
def eng_incremental_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from oroboro_dw_dbt_spark.engine.dag import ModelGraph, SourceRegistry, model

    sources = SourceRegistry()
    sources.add_provider("orders", lambda s: load_table(s, sf_dir, "orders"))
    state = {"batch": "v1", "since": None}

    @model(name="latest_orders", materialized="incremental", unique_key=("o_orderkey",))
    def latest_orders(orders):
        df = orders
        if state["since"] is not None:
            df = df.filter(F.col("o_orderdate") >= F.lit(state["since"]).cast("timestamp"))
        return df.select(
            "o_orderkey", "o_totalprice", F.lit(state["batch"]).alias("batch")
        )

    graph = ModelGraph(
        sources, warehouse_dir=tempfile.mkdtemp(prefix="inc_wh_"), threads=1
    )
    graph.add(latest_orders)
    graph.run(spark, select=["latest_orders"], run_tests=False)
    state.update(batch="v2", since="1999-01-01 00:00:00")
    graph.run(spark, select=["latest_orders"], run_tests=False)
    return graph.frame("latest_orders")


@query(
    "j_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_orders' AS op FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS op FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_ref="beyond-reference: explicit LEFT SEMI / LEFT ANTI joins "
    "(EXISTS / NOT EXISTS) — no fan-out, no dedup pass",
)
def j_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    okeys = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = F.col("c_custkey") == F.col("o_custkey")
    return (
        cust.join(okeys, cond, "left_semi")
        .withColumn("op", F.lit("has_orders"))
        .unionByName(
            cust.join(okeys, cond, "left_anti").withColumn("op", F.lit("no_orders"))
        )
    )


@query(
    "m_safe_math",
    # BigQuery SAFE.* semantics via Spark try_* — NULL instead of error,
    # with ANSI mode left ON (SURVEY §7.2 decision)
    oracle="""
    SELECT o_orderkey,
           o_totalprice / nullif(CAST(o_orderkey % 4 AS DOUBLE), 0.0) AS safe_div,
           TRY_CAST(o_orderpriority AS INT) AS bad_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num
    FROM orders
    """,
    survey_ref="§2.9 M1 division semantics: try_divide / try_cast keep "
    "ANSI on while matching BigQuery SAFE.* null-on-error",
)
def m_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 4).cast("double")
        ).alias("safe_div"),
        F.try_to_number(F.col("o_orderpriority"), F.lit("9")).cast("int").alias("bad_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
    )


@query(
    "eng_compact_run",
    # identity contract: compaction must not add, drop, or alter a row.
    # The oracle recomputes the same per-type aggregate straight from the
    # source table — any lost/duplicated row in the rewrite breaks the
    # hash. File-count mechanics are asserted in tests/test_engine.py
    # (DuckDB can't see the filesystem layout).
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(event_id AS HUGEINT)) AS DOUBLE) AS id_sum
    FROM events
    GROUP BY event_type
    """,
    survey_ref="engine maintenance: small-file compaction through the "
    "atomic swap (engine/maintenance.py), row identity driver-certified",
)
def eng_compact_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Land the events table as 16 deliberately-small files, compact to
    ≈2, and aggregate from the COMPACTED table — the driver's hash match
    against the raw source certifies the rewrite is row-identical."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import compact_table
    from oroboro_dw_dbt_spark.engine.maintenance import data_file_stats

    path = Path(tempfile.mkdtemp(prefix="compact_wh_")) / "events"
    load_table(spark, sf_dir, "events").repartition(16).write.parquet(str(path))
    _, total = data_file_stats(path)
    compacted = compact_table(spark, path, target_file_bytes=(total + 1) // 2)
    return compacted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("event_id").cast("double").alias("id_sum"),
    )


@query(
    "eng_acid_commit",
    # ACID contract as data, all four phases recomputed independently by
    # the oracle from the source table:
    #   v1        — first commit (even event_ids)
    #   crash     — a write that dies BETWEEN data write and pointer
    #               commit must leave readers on v1 exactly
    #   v2        — the retried commit (odd event_ids) is fully visible
    #   timetravel— version 1 stays readable after v2 (snapshot isolation)
    oracle="""
    WITH ev AS (SELECT event_id, value FROM events),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(event_id AS HUGEINT)) AS DOUBLE) AS id_sum
      FROM ev WHERE event_id % 2 = 0
    ),
    agg_odd AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(event_id AS HUGEINT)) AS DOUBLE) AS id_sum
      FROM ev WHERE event_id % 2 = 1
    )
    SELECT 'v1' AS phase, n, id_sum FROM agg
    UNION ALL SELECT 'after_crash', n, id_sum FROM agg
    UNION ALL SELECT 'v2', n, id_sum FROM agg_odd
    UNION ALL SELECT 'timetravel_v1', n, id_sum FROM agg
    """,
    survey_ref="engine storage: ManifestParquetFormat ACID commit — "
    "atomic pointer swap, read-after-crash equivalence, time travel "
    "(engine/table_format.py; the Delta/Iceberg seam made concrete)",
)
def eng_acid_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the manifest format through commit → injected crash →
    retry → time travel, aggregating what a READER sees at each phase.
    The crash is injected between the snapshot's data write and the
    pointer swap (the widest vulnerable window); the driver's hash
    match against pure source SQL certifies the reader was never
    exposed to the half-written snapshot."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="acid_wh_")) / "events_acid"
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")

    fmt = ManifestParquetFormat()
    fmt.write(ev.filter(F.col("event_id") % 2 == 0), table)  # v1

    class Killed(RuntimeError):
        pass

    def die(path: Path, version: int) -> None:
        raise Killed(f"chaos: killed before committing v{version}")

    chaos = ManifestParquetFormat(before_commit=die)
    try:
        chaos.write(ev.filter(F.col("event_id") % 2 == 1), table)
    except Killed:
        pass  # data-XXXXX2 exists on disk but is unreferenced

    def agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("event_id").cast("double").alias("id_sum"),
        ).select("phase", "n", "id_sum")

    # reads pin a concrete immutable data dir, so laziness is safe:
    # each phase's DataFrame keeps pointing at its own snapshot
    phases = [agg(fmt.read(spark, table), "v1")]  # == first commit
    phases.append(agg(fmt.read(spark, table), "after_crash"))  # still v1
    fmt.write(ev.filter(F.col("event_id") % 2 == 1), table)  # retry commits v2
    phases.append(agg(fmt.read(spark, table), "v2"))
    phases.append(agg(fmt.read(spark, table, version=1), "timetravel_v1"))
    out = phases[0]
    for p in phases[1:]:
        out = out.unionByName(p)
    return out


def _zorder_entry_oracle() -> str:
    from oroboro_dw_dbt_spark.engine.layout import zorder_oracle_expr

    # bands are computed ONCE as BIGINTs in a CTE: DuckDB's `//` on a
    # DOUBLE (epoch() returns fractional seconds) is plain division,
    # not floor division — the interleave arithmetic needs integers
    z = zorder_oracle_expr("xb", "yb")
    return f"""
    WITH banded AS (
      SELECT event_type, value,
             user_id % 256 AS xb,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) % 256 AS yb
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS value_sum,
           min({z}) AS min_z, max({z}) AS max_z
    FROM banded
    WHERE xb >= 64 AND xb < 96 AND yb >= 32 AND yb < 64
    GROUP BY event_type
    """


@query(
    "eng_zorder_layout",
    # the same box query + Morton arithmetic restated over the RAW
    # source: parity certifies both the z-value math (min/max z per
    # group) and that the z-ordered rewrite lost/changed no rows
    oracle=_zorder_entry_oracle(),
    survey_ref="engine storage: Z-order (Morton) file layout — "
    "multi-dimensional data skipping beyond 1-D Hive partitioning "
    "(engine/layout.py; rectangle property footer-asserted in pytest)",
)
def eng_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order events by (user band, hour band), then answer a 2-D box
    query from the rewritten files.

    The write is one range-partition shuffle + local sort on the
    interleaved key; each output file then covers a small rectangle of
    the (user, hour) plane, so the box predicate prunes most files via
    parquet footer min/max — the two-filter-column case that defeats
    single-dimension Hive partitioning. Here the certified surface is
    value identity (rewrite lost nothing) and exact z arithmetic; the
    pruning claim itself is asserted on real file footers in
    tests/test_zorder_layout.py rather than trusted."""
    import tempfile

    from oroboro_dw_dbt_spark.engine.layout import zorder_value, zorder_write

    ev = load_table(spark, sf_dir, "events")
    xband = F.col("user_id") % 256
    yband = F.expr("unix_timestamp(ts) div 3600") % 256
    zdir = tempfile.mkdtemp(prefix="zorder_wh_") + "/events_z"
    zorder_write(ev, zdir, xband, yband, bits=8, n_files=16)

    back = spark.read.parquet(zdir)
    bx = F.col("user_id") % 256
    by = F.expr("unix_timestamp(ts) div 3600") % 256
    return (
        back.filter(bx.between(64, 95) & by.between(32, 63))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("value_sum"),
            F.min(zorder_value(bx, by)).alias("min_z"),
            F.max(zorder_value(bx, by)).alias("max_z"),
        )
    )


@query(
    "eng_delete_vectors",
    # merge-on-read delete contract as data, each phase recomputed by
    # the oracle from the source table:
    #   v1          — full table committed
    #   mor_delete  — equality-delete of negative balances: readers see
    #                 the filtered table though no data file changed
    #                 (file-immutability asserted in pytest)
    #   timetravel  — version 1 still shows the deleted rows
    #   compacted   — copy-on-write fold of the vectors: same result,
    #                 now with zero delete files on the read path
    oracle="""
    WITH c AS (SELECT c_custkey, c_acctbal FROM customer),
    full_t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS bal_sum
      FROM c
    ),
    kept AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS bal_sum
      FROM c WHERE c_acctbal >= 0
    )
    SELECT 'v1' AS phase, n, bal_sum FROM full_t
    UNION ALL SELECT 'mor_delete', n, bal_sum FROM kept
    UNION ALL SELECT 'timetravel_v1', n, bal_sum FROM full_t
    UNION ALL SELECT 'compacted', n, bal_sum FROM kept
    """,
    survey_ref="engine storage: merge-on-read equality deletes "
    "(Iceberg-style delete vectors) — O(deleted keys) write "
    "amplification, anti-join read path, copy-on-write compaction "
    "(engine/table_format.py delete_keys/compact_deletes)",
)
def eng_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive merge-on-read deletes through commit → delete → time
    travel → compaction, aggregating what a reader sees at each phase.

    The scale story IS the phase list: the delete writes only the key
    set (a 1000-row delete on a 100 TB table stays a KB-scale commit),
    readers apply vectors as a broadcast anti-join on the immutable
    data files, history stays byte-identical for time travel, and
    compaction is the explicitly-scheduled copy-on-write fold — never
    an implicit one hiding in a delete call."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="mor_wh_")) / "customer_mor"
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")

    fmt = ManifestParquetFormat()
    fmt.write(cust, table)  # v1
    bal = F.col("c_acctbal").cast("decimal(12,4)")

    def agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(bal), 2).cast("double").alias("bal_sum"),
        ).select("phase", "n", "bal_sum")

    phases = [agg(fmt.read(spark, table), "v1")]
    fmt.delete_keys(
        spark, table, cust.filter(F.col("c_acctbal") < 0), "c_custkey"
    )
    phases.append(agg(fmt.read(spark, table), "mor_delete"))
    phases.append(agg(fmt.read(spark, table, version=1), "timetravel_v1"))
    fmt.compact_deletes(spark, table)
    phases.append(agg(fmt.read(spark, table), "compacted"))
    out = phases[0]
    for p in phases[1:]:
        out = out.unionByName(p)
    return out


@query(
    "eng_incremental_agg",
    # the oracle is the FULL RECOMPUTE the incremental path must equal
    # bit-for-bit: additive integer state (micro-quantized values) makes
    # delta-merge associative, so three ingest steps == one big scan
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                      / 1000000.0, 6) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY event_type
    """,
    survey_ref="engine lifecycle: incremental aggregate maintenance — "
    "per-batch delta merge through the ACID table format equals full "
    "recompute exactly (engine/maintenance.py merge_additive_state)",
)
def eng_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain an aggregate mart across three ingest batches without
    rescanning history, then prove it equals the full recompute.

    Each step pre-aggregates ONLY the new batch to the mart's grain and
    merges it with the stored per-key state (union + re-aggregate, one
    grain-key shuffle over state+delta rows); state persists through
    the manifest format, so every step is an atomic snapshot commit.
    Exactness hinges on the measures being additive over integers —
    value is micro-quantized, so three-step merge == one-scan oracle
    bit-for-bit (a float sum would drift with accumulation order).
    At 100 TB: the history is never re-read; each day costs the day."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat
    from oroboro_dw_dbt_spark.engine.maintenance import merge_additive_state

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("micro"),
    )
    batches = [
        ev.filter(F.col("day") <= 10),
        ev.filter((F.col("day") > 10) & (F.col("day") <= 20)),
        ev.filter(F.col("day") > 20),
    ]
    fmt = ManifestParquetFormat()
    table = Path(tempfile.mkdtemp(prefix="incr_agg_wh_")) / "state"
    state = None
    for batch in batches:
        delta = batch.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("micro").cast("bigint").alias("micro_sum"),
        )
        state = merge_additive_state(
            state, delta, keys=["event_type"], sum_cols=["n", "micro_sum"]
        )
        fmt.write(state, table)  # atomic snapshot per ingest step
        state = fmt.read(spark, table)
    return state.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("micro_sum") / 1_000_000.0, 6)
        .cast("double")
        .alias("value_sum"),
    )


@query(
    "eng_manifest",
    # the reference DAG's documented shape, as data: dbt docs-generate
    # parity certified through the driver (3 nodes, their materialized
    # configs, and model-vs-source dependency counts; user_base carries
    # the two declared marts_schema.yml tests)
    oracle="""
    SELECT * FROM (VALUES
      ('locations_clean', 'view', 0, 3, 0),
      ('stacked_users_partners', 'view', 0, 10, 0),
      ('user_base', 'table', 2, 2, 2)
    ) AS t(model, materialized, n_model_deps, n_source_deps, n_tests)
    """,
    survey_ref="engine lifecycle: ModelGraph.manifest() lineage artifact "
    "(dbt docs generate), ref: dbt_project.yml:9-17, marts_schema.yml:1-16",
)
def eng_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.operators.reference_suite import reference_graph

    import tempfile

    m = reference_graph(
        spark, sf_dir, warehouse_dir=tempfile.mkdtemp(prefix="manifest_wh_")
    ).manifest()
    rows = [
        (
            n["name"],
            n["materialized"],
            len(n["depends_on"]["models"]),
            len(n["depends_on"]["sources"]),
            len(n["tests"]),
        )
        for n in m["nodes"].values()
    ]
    return spark.createDataFrame(
        rows,
        "model string, materialized string, n_model_deps int, "
        "n_source_deps int, n_tests int",
    )


@query(
    "w_time_range_frames",
    # RANGE frame keyed on epoch-MICROSECONDS on both engines: a cast to
    # whole seconds would move the 1-hour boundary for sub-second event
    # times; peers (equal timestamps) are included by RANGE semantics
    # identically on both sides
    oracle="""
    SELECT event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(round(sum(CAST(value AS DECIMAL(12,4))) OVER w, 2) AS DOUBLE)
             AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    survey_ref="beyond-reference: time-RANGE window frames (rolling "
    "1-hour per-user aggregates — the sliding-lookback shape ROWS "
    "frames can't express)",
)
def w_time_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour count/sum via a RANGE BETWEEN frame over
    epoch-micros. One shuffle on user_id (high-cardinality, even), then
    a single sort serves the frame scan — at 100 TB identical shape to
    the batch sessionization. DECIMAL accumulates the sum exactly; the
    rounded double is the cross-engine contract."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.round(F.sum(F.col("value").cast("decimal(12,4)")).over(w), 2)
        .cast("double")
        .alias("sum_1h"),
    )


@query(
    "ev_anomaly_zscore",
    # every aggregate feeding the z-score is an exact DECIMAL sum, so
    # mean/variance derive from bit-identical doubles on both engines
    # and the final round(z, 6) cannot flake (the float-sum-order
    # lesson from the round-1 flagship failures)
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DECIMAL(14,2)) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sum_x,
             sum(x * x) AS sum_xx
      FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.hr, CAST(h.x AS DOUBLE) AS hourly_value,
           round((CAST(h.x AS DOUBLE) - CAST(s.sum_x AS DOUBLE) / s.n)
                 / sqrt((CAST(s.sum_xx AS DOUBLE)
                         - CAST(s.sum_x AS DOUBLE) * CAST(s.sum_x AS DOUBLE) / s.n)
                        / (s.n - 1)), 6) AS z
    FROM hourly h JOIN stats s USING (event_type)
    WHERE s.n > 1
      AND (CAST(s.sum_xx AS DOUBLE)
           - CAST(s.sum_x AS DOUBLE) * CAST(s.sum_x AS DOUBLE) / s.n) > 0
    """,
    survey_ref="beyond-reference: per-series z-score anomaly detection "
    "over hourly rollups (exact decimal moments -> deterministic z)",
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomalies per event_type: z-score of each hour's
    value against the series' own distribution. Two shuffles total
    (hourly rollup, then per-type moments joined back — the moments
    side is tiny and broadcasts). Moments accumulate in DECIMAL so the
    derived mean/σ are bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
        .cast("decimal(14,2)")
        .alias("x")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
    )
    xd = F.col("x").cast("double")
    sxd = F.col("sum_x").cast("double")
    sxxd = F.col("sum_xx").cast("double")
    var_num = sxxd - sxd * sxd / F.col("n")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((F.col("n") > 1) & (var_num > 0))
        .select(
            "event_type",
            "hr",
            xd.alias("hourly_value"),
            F.round((xd - sxd / F.col("n")) / F.sqrt(var_num / (F.col("n") - 1)), 6).alias("z"),
        )
    )


@query(
    "p_unpivot_long",
    # the oracle restates UNPIVOT as its defining UNION ALL expansion —
    # engine-portable, and proves the wide->long reshape loses nothing
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
             CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM wide
    """,
    survey_ref="beyond-reference: UNPIVOT / melt (wide->long reshape — "
    "the inverse of pivot_wide, §2.12 absent from the reference)",
)
def p_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide metric columns melted to (id, metric, value) rows with the
    DataFrame unpivot API. Row-local reshape: the fan-out multiplies
    rows AFTER the aggregate (3 × |groups|), so nothing new shuffles —
    the safe direction to run at any scale (pivot, the inverse, is the
    one that needs a value allowlist)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        *[
            F.round(F.sum(F.col(c).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias(a)
            for c, a in [
                ("l_quantity", "sum_qty"),
                ("l_extendedprice", "sum_price"),
                ("l_discount", "sum_disc"),
            ]
        ]
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "a_regression_pandas",
    # SAME oracle as a_regression_stats: the entry certifies the
    # grouped-map applyInPandas API produces bit-identical results to
    # the Column-expression plan. Python ints are arbitrary-precision —
    # the kernel's moment sums are exact like the DECIMAL(38,0)/HUGEINT
    # sums, and the final float divisions mirror the SQL's cast order
    # op-for-op; rounding happens JVM-side (HALF_UP, like the oracle).
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS HUGEINT) AS x,
             CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0, 6) AS slope_micro,
           round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / n / 1000000.0, 6) AS intercept
    FROM m
    """,
    survey_ref="beyond-reference API surface: grouped-map applyInPandas "
    "(per-group kernel), result-identical to the Column-tree twin",
)
def a_regression_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least squares via applyInPandas: one pandas kernel per
    event_type computes the moment sums as Python ints (exact, like the
    twin's DECIMAL(38,0)) and the slope/intercept with float ops
    mirroring the SQL cast-for-cast. Grouped-map shuffles each group to
    one kernel call — right when per-group state must live in Python
    (models, scipy); the Column-tree twin (a_regression_stats) is the
    plan to prefer when expressions suffice."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(t.value // 1_000_000_000) for t in pdf["ts"]]
        ys = [int((v * 1_000_000 + 0.5) // 1) for v in pdf["value"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * float(sx)) / float(n) / 1_000_000.0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": pd.Series([n], dtype="int64"),
                "slope_raw": [slope * 1_000_000.0],
                "intercept_raw": [intercept],
            }
        )

    fitted = ev.groupBy("event_type").applyInPandas(
        fit, "event_type string, n bigint, slope_raw double, intercept_raw double"
    )
    return fitted.select(
        "event_type",
        "n",
        F.round("slope_raw", 6).alias("slope_micro"),
        F.round("intercept_raw", 6).alias("intercept"),
    )


@query(
    "p_null_semantics",
    # Spark's <=> is DuckDB's IS NOT DISTINCT FROM; COUNT(col) skips
    # NULLs while COUNT(*) doesn't; sum over an all-NULL group is NULL,
    # not 0 — the three null traps every dialect port hits
    oracle="""
    SELECT nullif(o_orderkey % 5, 0) AS a_val,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(nullif(o_orderkey % 3, 0)) AS BIGINT) AS n_b_nonnull,
           CAST(sum(CASE WHEN nullif(o_orderkey % 5, 0)
                         IS NOT DISTINCT FROM nullif(o_orderkey % 3, 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ns_eq,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                         ELSE o_orderkey END) AS DOUBLE) AS sum_with_nulls
    FROM orders
    GROUP BY 1
    """,
    survey_ref="beyond-reference dialect surface: null-safe equality "
    "(<=> / IS NOT DISTINCT FROM), COUNT(col) NULL-skipping, "
    "NULL-propagating aggregates",
)
def p_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderkey") % 5, F.lit(0))
    b = F.nullif(F.col("o_orderkey") % 3, F.lit(0))
    return (
        orders.select(
            a.alias("a_val"),
            b.alias("b"),
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_orderkey"))
            .alias("k7"),
        )
        .groupBy("a_val")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("b").cast("bigint").alias("n_b_nonnull"),
            F.sum(F.col("a_val").eqNullSafe(F.col("b")).cast("int"))
            .cast("bigint")
            .alias("n_ns_eq"),
            F.sum("k7").cast("double").alias("sum_with_nulls"),
        )
    )


@query(
    "eng_csv_seed",
    # dbt seed lifecycle: a CSV lands as a source with an EXPLICIT
    # schema (no inference pass — at 100 TB schema inference is a full
    # extra read), flows through a model, and must aggregate exactly as
    # the parquet original it was exported from
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_orderkey % 10 = 0
    GROUP BY o_orderpriority
    """,
    survey_ref="engine S1 csv source (dbt seed, ref: dbt seeds dir "
    "convention): explicit-schema csv -> SourceRegistry -> model",
)
def eng_csv_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from oroboro_dw_dbt_spark.engine.dag import ModelGraph, SourceRegistry, model

    seed_dir = tempfile.mkdtemp(prefix="csv_seed_")
    subset = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    subset.write.mode("overwrite").option("header", "true").csv(seed_dir)

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    sources = SourceRegistry()
    sources.add_path(
        "seed_orders", seed_dir, schema=schema, format="csv",
        options={"header": "true"},
    )

    @model(name="seed_rollup")
    def seed_rollup(seed_orders):
        return seed_orders.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )

    graph = ModelGraph(sources).add(seed_rollup)
    graph.run(spark, select=["seed_rollup"], run_tests=False)
    return graph.frame("seed_rollup")


@query(
    "f_map_ops",
    # the map is engine-internal (map key order is unspecified, so maps
    # never appear in output); the entry certifies the MapType
    # roundtrip by identity: build map -> explode back must reproduce
    # the plain aggregation exactly
    oracle="""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE user_id % 11 = 0
    GROUP BY user_id, event_type
    """,
    survey_ref="beyond-reference API surface: MapType "
    "(map_from_entries / explode-to-entries roundtrip, certified by "
    "identity)",
)
def f_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type count map: collect (type, n) entries into a
    MAP column, then explode the map back to rows. Map columns are the
    right shape for sparse per-entity features at 100 TB (one row per
    entity, not per feature) — but they stay engine-internal here
    because map iteration order is unspecified, so the certified
    surface is the lossless roundtrip."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 11 == 0)
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    mapped = per_user.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id", F.explode("type_counts").alias("event_type", "n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    survey_ref="beyond-reference: explicit GROUPING SETS with grouping "
    "flags (the arbitrary-subtotal shape rollup/cube can't pick freely)",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary subtotal lattice via GROUPING SETS (one pass, Expand
    node — each input row fans to its 3 grouping sets before one
    aggregation; no union of separate scans). gid disambiguates real
    NULL group values from subtotal rows, exactly as in agg_rollup."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS sum_qty,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
                 AS gid
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "f_pandas_udf_scalar",
    # same-oracle twin of a Column expression: the vectorized scalar
    # pandas_udf (Arrow series -> series) must add no numeric drift
    oracle="""
    SELECT o_orderkey,
           round(1.0 / (1.0 + exp(-(o_totalprice / 100000.0 - 1.0))), 6)
             AS squashed
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
    survey_ref="beyond-reference API surface: scalar pandas_udf "
    "(Arrow-vectorized series kernel), completing the Python API "
    "matrix (mapInPandas / applyInPandas[WithState] / UDTF / scalar)",
)
def f_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF: one Arrow batch in, one Series out — the
    ~10-100x-over-row-Python path when a scalar kernel must be Python.
    The sigmoid here mirrors the SQL op-for-op; rounding stays JVM-side
    so the oracle's HALF_UP convention applies."""
    from pyspark.sql.functions import pandas_udf

    # no param annotations: postponed-evaluation mode (PEP 563, active
    # module-wide here) stringifies them and pandas_udf can't resolve
    # that; the returnType plus bare signature is the supported spelling
    @pandas_udf("double")
    def squash(price):
        import numpy as np

        return 1.0 / (1.0 + np.exp(-(price / 100000.0 - 1.0)))

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return orders.select(
        "o_orderkey", F.round(squash(F.col("o_totalprice")), 6).alias("squashed")
    )


@query(
    "eng_json_source",
    # same contract as eng_csv_seed for the JSON-lines reader: explicit
    # schema (no inference pass), values surviving the text round-trip
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_orderkey % 9 = 0
    GROUP BY o_orderpriority
    """,
    survey_ref="engine S1 json source: explicit-schema JSON-lines -> "
    "SourceRegistry -> model (the log-ingest landing format)",
)
def eng_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from oroboro_dw_dbt_spark.engine.dag import ModelGraph, SourceRegistry, model

    land_dir = tempfile.mkdtemp(prefix="json_src_")
    subset = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 9 == 0
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    subset.write.mode("overwrite").json(land_dir)

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    sources = SourceRegistry()
    sources.add_path("landed_orders", land_dir, schema=schema, format="json")

    @model(name="json_rollup")
    def json_rollup(landed_orders):
        return landed_orders.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )

    graph = ModelGraph(sources).add(json_rollup)
    graph.run(spark, select=["json_rollup"], run_tests=False)
    return graph.frame("json_rollup")


@query(
    "eng_orc_source",
    # completes the source-format matrix (parquet everywhere, csv seed,
    # json lines, orc here): ORC is columnar like parquet, so unlike
    # the text formats the round-trip is binary-exact by construction —
    # the entry certifies the reader wiring, schema application, and
    # pushdown-capable scan
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_orderkey % 8 = 0
    GROUP BY o_orderpriority
    """,
    survey_ref="engine S1 orc source: the columnar alternative format "
    "through SourceRegistry -> model",
)
def eng_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from oroboro_dw_dbt_spark.engine.dag import ModelGraph, SourceRegistry, model

    land_dir = tempfile.mkdtemp(prefix="orc_src_")
    load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 8 == 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).write.mode("overwrite").orc(land_dir)

    sources = SourceRegistry()
    sources.add_path("orc_orders", land_dir, format="orc")

    @model(name="orc_rollup")
    def orc_rollup(orc_orders):
        return orc_orders.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total"),
        )

    graph = ModelGraph(sources).add(orc_rollup)
    graph.run(spark, select=["orc_rollup"], run_tests=False)
    return graph.frame("orc_rollup")


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------
@query(
    "j_null_safe_join",
    # NULL keys match each other under <=>, unlike '=' which drops them
    # — the semantic a dedup-by-nullable-business-key pipeline needs.
    # Fixture: orders bucketed by a key that is NULL for every third
    # order, self-joined null-safely at equal bucket counts.
    oracle="""
    WITH k AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE CAST(o_orderkey % 7 AS INT) END AS nk
      FROM orders WHERE o_orderkey <= 600
    )
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           a.nk AS nk
    FROM k a JOIN k b
      ON a.nk IS NOT DISTINCT FROM b.nk AND a.o_orderkey < b.o_orderkey
    """,
    survey_ref="beyond-reference: null-safe equi-join (<=> / "
    "IS NOT DISTINCT FROM) — NULL business keys group together instead "
    "of silently dropping from the join",
)
def j_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe self-join: eqNullSafe compiles to a hash-join key that
    treats NULL as a value (<=>), so NULL-keyed rows co-partition and
    match — still a shuffle-hash/broadcast equi-join in the plan, NOT a
    nested loop (a naive `a.nk = b.nk OR both null` predicate degrades
    to BroadcastNestedLoopJoin; asserted in tests/test_plans.py)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 600)
    k = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("o_orderkey") % 7).cast("int"))
        .alias("nk"),
    )
    a, b = k.alias("a"), k.alias("b")
    return (
        a.join(
            b,
            F.col("a.nk").eqNullSafe(F.col("b.nk"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .select(
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            F.col("a.nk").alias("nk"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / string_agg)
# ---------------------------------------------------------------------------
@query(
    "a_string_agg_ordered",
    # deterministic listagg: collect, SORT, then join — collect_list
    # order is partition-dependent, so the explicit array_sort is what
    # makes the concatenation reproducible (the W4 lesson applied to
    # aggregation)
    oracle="""
    SELECT o_orderpriority,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_orderkey) AS keys_csv,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_orderkey <= 200
    GROUP BY o_orderpriority
    """,
    survey_ref="beyond-reference: ordered string aggregation "
    "(LISTAGG/string_agg with ORDER BY — deterministic via explicit "
    "sort before join)",
)
def a_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group CSV of keys in pinned numeric order. collect_list's
    order is whatever the partitions delivered — array_sort on the
    NUMERIC values before stringification pins it (sorting the strings
    would put 100 before 2). One shuffle with map-side partials."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("keys_csv"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (storage-level shuffle elimination)
# ---------------------------------------------------------------------------
@query(
    "eng_bucketed_join",
    # value-identity certification of the bucketed path: the join result
    # over bucketed catalog tables must equal the same join computed
    # straight from the source parquet (the oracle). The shuffle-free
    # plan property is asserted in tests/test_bucketing.py — DuckDB
    # cannot see Spark's physical plan, but it can prove the rows.
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey_ref="beyond-reference: bucketed co-located join — the "
    "pay-the-shuffle-once storage lever (write bucketBy+sortBy, join "
    "with zero Exchange; plan asserted in tests/test_bucketing.py)",
)
def eng_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders and customer bucketed by the join key into the
    session catalog, then join them co-located and aggregate. At 100 TB
    this is the storage decision that turns every repeated fact-dim
    join on the key into a zero-Exchange plan; bucket count is a
    capacity choice (one bucket ≈ one core's memory)."""
    from oroboro_dw_dbt_spark.sources.bucketing import colocated_join, write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders_entry", ["o_custkey"], 8,
    )
    write_bucketed(
        cust.select("c_custkey", "c_mktsegment"), "b_customer_entry", ["c_custkey"], 8
    )
    joined = colocated_join(
        spark, "b_orders_entry", "b_customer_entry",
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@query(
    "eng_partitioned_prune",
    # the oracle recomputes the week's aggregate straight from the raw
    # table — a pruning bug that reads the wrong partitions (or a write
    # that misassigns rows to partition dirs) breaks the hash. That the
    # scan PHYSICALLY skips the other 23 partition dirs is asserted on
    # the plan in tests/test_partition_prune.py (DuckDB can't see the
    # directory layout).
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS value_sum
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
      AND CAST(ts AS DATE) <= DATE '2024-01-14'
    GROUP BY 1
    """,
    survey_ref="engine storage: Hive-partitioned table write + "
    "partition-pruned read — the first-order 100 TB IO lever",
)
def eng_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events Hive-partitioned by day, read one week back.

    THE first-order scale lever: a date-partitioned 100 TB fact makes
    any time-bounded query read only the matching partition dirs —
    the filter binds at FILE LISTING time (PartitionFilters), before a
    single byte of parquet is opened. Here 7 of 30 day-dirs survive
    listing; the same layout at 1000x data prunes identically because
    pruning cost scales with the PARTITION COUNT, not the data. The
    partition column is written as its string form (Hive dirs are
    strings) and the week filter is applied on the partition values."""
    import tempfile
    from pathlib import Path

    path = Path(tempfile.mkdtemp(prefix="part_wh_")) / "events_by_day"
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    ).write.partitionBy("event_date").parquet(str(path))
    week = spark.read.parquet(str(path)).filter(
        (F.col("event_date") >= "2024-01-08") & (F.col("event_date") <= "2024-01-14")
    )
    return week.groupBy(F.col("event_date").cast("string").alias("event_date")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,4)")), 2)
        .cast("double")
        .alias("value_sum"),
    )
