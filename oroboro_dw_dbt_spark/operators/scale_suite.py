"""Catalog entries for the explicit scale patterns: salted joins,
two-phase distinct aggregation, and sketch aggregates.

The salting entries are result-identical to their plain SQL forms —
that equivalence IS the oracle check (the salt must never change the
answer). The sketch entries are approximations with no cross-engine
bit-match, so they are rows-only here and error-bounded in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.ops import (
    approx_distinct_by,
    approx_quantiles_by,
    salted_join,
    two_phase_distinct_agg,
)
from oroboro_dw_dbt_spark.sources.testdata import load_table


@query(
    "skew_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_name
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
    survey_ref="beyond-reference: plan-level salted join for hot keys "
    "(result-identical to the plain join — the oracle proves it)",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    joined = salted_join(events, dim, on="user_id", how="inner", salt_buckets=8)
    return joined.select("event_id", "user_id", "event_type", "c_name")


@query(
    "skew_two_phase_agg",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    survey_ref="beyond-reference: two-phase COUNT(DISTINCT) rewrite "
    "(pair-dedup spread over hash(x), then per-group count)",
)
def skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = two_phase_distinct_agg(
        events,
        group_key="event_type",
        distinct_col="user_id",
        aggs={
            "n_events": F.count(F.lit(1)).cast("bigint"),
            "sum_value": F.sum(F.col("value").cast("decimal(12,4)")),
        },
    )
    return out.select(
        "event_type",
        "n_distinct",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("sum_value", 2).cast("double").alias("sum_value"),
    )


@query(
    "sk_approx_distinct",
    # the HLL++ estimate has no cross-engine bit-match, so the entry
    # emits the EXACT distinct (hashable) plus a within_bound flag
    # computed in the same plan — the oracle asserts the flag is
    # deterministically true, making the sketch hash-checkable
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS within_bound
    FROM events
    GROUP BY event_type
    """,
    survey_ref="beyond-reference: HyperLogLog++ approximate distinct per group",
)
def sk_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    rsd = 0.02
    approx = approx_distinct_by(events, "event_type", "user_id", rsd=rsd)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    # bound: 5σ of the target rsd plus small-count slack (HLL++ switches
    # to an exact sparse mode below ~thousands, where error is 0)
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.greatest(5 * rsd * F.col("exact_distinct"), F.lit(5.0))
            ).alias("within_bound"),
        )
    )


@query(
    "sk_hll_merge",
    # MERGEABILITY is the property that makes sketches work at 100 TB:
    # per-shard partial sketches unioned must estimate the same set as
    # the single-pass sketch, so distinct-count state can pre-aggregate
    # map-side, roll up across days/partitions, and never rescan. The
    # two paths are bit-equal in sparse mode but may differ by a hair
    # in dense mode (the union runs HLL_8 internally while a direct
    # sketch may stay HLL_4 — observed at sf0.1: 1500 vs 1501), so the
    # flag is a tight relative bound, not equality: a union that
    # CONCATENATED instead of deduplicating would inflate the estimate
    # ~8× here and trip it instantly. exact_distinct anchors the hash.
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS merge_matches_direct, true AS within_bound
    FROM events
    GROUP BY event_type
    """,
    survey_ref="beyond-reference: DataSketches HLL partial-sketch union "
    "(hll_sketch_agg / hll_union_agg) — merge == single-pass, the "
    "pre-aggregation contract for distinct counts at scale",
)
def sk_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard → sketch → union vs direct sketch, per event type.

    Shards split on event_id (so every shard sees overlapping user
    sets — the union must actually deduplicate, not concatenate). An
    HLL register is a max over observed hashes and max is associative,
    so partial sketches lose nothing; the estimates agree to well
    under the sketch's own error (equal in sparse mode, ±1 count in
    dense — see the oracle note). That is why a 100 TB daily-distinct
    rollup can store per-day sketch state (KB per group) and answer
    any date-range distinct query by unioning sketches instead of
    rescanning the range."""
    events = load_table(spark, sf_dir, "events")
    rsd = 0.02  # lgConfigK=12 default → ~1.6% rsd
    shards = events.groupBy(
        "event_type", (F.col("event_id") % 8).alias("shard")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = shards.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = events.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= F.greatest(rsd / 2 * F.col("direct_est"), F.lit(2.0))
        ).alias("merge_matches_direct"),
        (
            F.abs(F.col("direct_est") - F.col("exact_distinct"))
            <= F.greatest(5 * rsd * F.col("exact_distinct"), F.lit(5.0))
        ).alias("within_bound"),
    )


@query(
    "sk_countmin_merge",
    # count-min merge is EXACT (integer counter adds are associative),
    # unlike HLL's dense-mode drift — so here merge-equals-direct is
    # certified as strict equality, and estimates from merged state
    # match the direct sketch value-for-value; the oracle recomputes
    # the direct estimates from scratch
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ),
    counters AS (
      SELECT r.i,
             CAST('0x' || substr(md5('cm|' || r.i || '|' || token), 1, 8) AS BIGINT)
               % 512 AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM toks CROSS JOIN (VALUES (0), (1), (2)) AS r(i)
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT token, CAST(count(*) AS BIGINT) AS true_n
      FROM toks GROUP BY token
      ORDER BY true_n DESC, token LIMIT 20
    ),
    est AS (
      SELECT t.token, min(c.n) AS cm_estimate
      FROM truth t
      CROSS JOIN (VALUES (0), (1), (2)) AS r(i)
      JOIN counters c
        ON c.i = r.i
       AND c.bucket = CAST('0x' || substr(md5('cm|' || r.i || '|' || t.token), 1, 8)
                           AS BIGINT) % 512
      GROUP BY t.token
    )
    SELECT t.token, CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
           true AS merge_equals_direct
    FROM truth t JOIN est e ON t.token = e.token
    """,
    survey_ref="beyond-reference: count-min sketch MERGE — per-shard "
    "counter tables summed per (row, bucket) equal the single-pass "
    "sketch exactly (integer adds), certified value-for-value",
)
def sk_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard -> counters -> sum vs direct counters, estimates compared
    value-for-value for the exact top-20 tokens.

    Four shard counter tables (doc_id % 4 — every shard sees every hot
    token, so the merge must ADD, not pick) summed per (row, bucket)
    must equal the whole-corpus sketch bit-for-bit: the merge IS plain
    integer addition, which is why count-min state pre-aggregates
    map-side, rolls up across days, and serves range queries without
    rescans — with exact equality where HLL (sk_hll_merge) settles for
    a bound."""
    from oroboro_dw_dbt_spark.ops.sketches import countmin_counters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    direct = countmin_counters(toks, "token")
    merged = None
    for shard in range(4):
        c = countmin_counters(toks.filter(F.col("doc_id") % 4 == shard), "token")
        merged = c if merged is None else merged.unionByName(c)
    merged = merged.groupBy("row", "bucket").agg(F.sum("n").alias("n"))
    # strict state equality: anti-joins empty in BOTH directions —
    # folded into the returned plan as a broadcast 1-row aggregate so
    # the build stays lazy (round-5 note: an eager limit(1).count()
    # here made this entry's "build" execute work at plan time)
    diff = direct.join(merged, ["row", "bucket", "n"], "left_anti").unionByName(
        merged.join(direct, ["row", "bucket", "n"], "left_anti")
    )
    states_equal_row = diff.agg(
        (F.count(F.lit(1)) == 0).alias("merge_equals_direct")
    )

    truth = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
        .orderBy(F.col("true_n").desc(), "token")
        .limit(20)
    )
    from oroboro_dw_dbt_spark.ops.sketches import _cm_bucket

    est = None
    for i in range(3):
        e = (
            truth.withColumn("row", F.lit(i))
            .withColumn("bucket", _cm_bucket("token", i, 512, "cm"))
            .join(merged, ["row", "bucket"])
            .select("token", F.col("n").alias("est"))
        )
        est = e if est is None else est.unionByName(e)
    return (
        est.groupBy("token")
        .agg(F.min("est").cast("bigint").alias("cm_estimate"))
        .crossJoin(F.broadcast(states_equal_row))
    )


@query(
    "sk_approx_quantiles",
    # GK guarantees RANK error ≤ n/accuracy; the entry checks the
    # empirical CDF at each returned quantile against that bound in the
    # same plan and emits flags the oracle asserts all-true
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_values,
           true AS within_50, true AS within_95, true AS within_99
    FROM events
    GROUP BY event_type
    """,
    survey_ref="beyond-reference: approximate percentiles per group",
)
def sk_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    accuracy = 10000
    quantiles = (0.5, 0.95, 0.99)
    approx = approx_quantiles_by(
        events, "event_type", "value", quantiles=quantiles, accuracy=accuracy
    )
    # join the (tiny, aggregated) quantile table back to the events and
    # measure where each returned value sits in the group's distribution:
    # count(value ≤ q)/n must reach q − ε and count(value < q)/n must not
    # exceed q + ε, with ε = 1/accuracy + 3/n (discretization slack).
    # The two-sided strict/non-strict pair keeps the check exact under
    # duplicate values.
    joined = events.select("event_type", "value").join(F.broadcast(approx), "event_type")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_values")]
    for q in quantiles:
        tag = int(q * 100)
        aggs.append(F.avg((F.col("value") <= F.col(f"q_{tag}")).cast("double")).alias(f"le_{tag}"))
        aggs.append(F.avg((F.col("value") < F.col(f"q_{tag}")).cast("double")).alias(f"lt_{tag}"))
    cdf = joined.groupBy("event_type").agg(*aggs)
    eps = 1.0 / accuracy
    out_cols = [F.col("event_type"), F.col("n_values")]
    for q in quantiles:
        tag = int(q * 100)
        slack = F.lit(eps) + 3.0 / F.col("n_values")
        out_cols.append(
            (
                (F.col(f"le_{tag}") >= F.lit(q) - slack)
                & (F.col(f"lt_{tag}") <= F.lit(q) + slack)
            ).alias(f"within_{tag}")
        )
    return cdf.select(*out_cols)
