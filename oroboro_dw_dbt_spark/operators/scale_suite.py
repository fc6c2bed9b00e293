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
    oracle=None,  # HLL++ sketch — no cross-engine bit-match; error-bounded in tests
    survey_ref="beyond-reference: HyperLogLog++ approximate distinct per group",
)
def sk_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return approx_distinct_by(events, "event_type", "user_id", rsd=0.02)


@query(
    "sk_approx_quantiles",
    oracle=None,  # GK sketch — rank-error bounded in tests
    survey_ref="beyond-reference: approximate percentiles per group",
)
def sk_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return approx_quantiles_by(events, "event_type", "value")
