"""Semantic unit tests for the TPC-H completion suite's decorrelation
traps — the places where a plausible rewrite silently changes results.
(Oracle parity for every entry is covered by test_operators.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_q13_customers_without_orders_survive(spark):
    """The priority filter must live in the join condition, not WHERE:
    customers whose every order is 5-LOW (or who have none) must appear
    in the c_count = 0 bucket, not vanish."""
    from oroboro_dw_dbt_spark.operators.tpch_suite import q13_order_count_distribution

    dist = {
        r["c_count"]: r["custdist"]
        for r in q13_order_count_distribution(spark, SF_SMOKE).collect()
    }
    n_cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").count()
    assert sum(dist.values()) == n_cust, "every customer lands in one bucket"

    # Cross-check the zero bucket directly: customers minus those with a
    # qualifying order.
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    with_order = (
        orders.filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert dist.get(0, 0) == n_cust - with_order


def test_q21_counts_lines_not_orders(spark):
    """A supplier with several delayed lines on one qualifying order is
    counted once per LINE (textbook Q21), not once per order — the
    census decorrelation must sum delayed_lines, not count rows."""
    from oroboro_dw_dbt_spark.operators.tpch_suite import q21_sole_supplier_delays

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    delayed = F.col("l_discount") > 0.07
    census = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(delayed, F.col("l_suppkey"))).alias("n_delayed"),
            F.max(F.when(delayed, F.col("l_suppkey"))).alias("delayed_supp"),
            F.sum(F.when(delayed, 1).otherwise(0)).alias("delayed_lines"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_delayed") == 1))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
    )
    multi = census.filter(F.col("delayed_lines") > 1).count()
    assert multi > 0, "fixture must exercise the multi-delayed-line case"

    expected_total = census.agg(F.sum("delayed_lines")).collect()[0][0]
    got_total = (
        q21_sole_supplier_delays(spark, SF_SMOKE)
        .agg(F.sum("numwait"))
        .collect()[0][0]
    )
    # top-25 covers every qualifying supplier at this sf (≤ ~40 suppliers)
    assert got_total == expected_total


def test_q15_max_ties_all_survive(spark):
    """`= max` join-back keeps every tied supplier — and matches the
    window-rank formulation it replaces."""
    from oroboro_dw_dbt_spark.operators.tpch_suite import q15_top_supplier
    from pyspark.sql.window import Window

    got = {r["s_suppkey"] for r in q15_top_supplier(spark, SF_SMOKE).collect()}

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
        ).alias("total_rev")
    )
    ranked = rev.withColumn(
        "rk", F.rank().over(Window.orderBy(F.col("total_rev").desc()))
    ).filter(F.col("rk") == 1)
    expected = {r["l_suppkey"] for r in ranked.collect()}
    assert got == expected and got
