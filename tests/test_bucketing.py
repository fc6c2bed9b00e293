"""Bucketed-table co-location: the join of two same-bucketed tables
must plan WITHOUT any Exchange — the storage layout pre-pays the
shuffle (sources/bucketing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.sources import colocated_join, load_table, write_bucketed

SF = "/root/testdata/sf0.001"


class TestBucketedJoin:
    def test_colocated_join_has_no_exchange(self, spark, tmp_path):
        orders = load_table(spark, SF, "orders")
        cust = load_table(spark, SF, "customer")
        write_bucketed(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "b_orders", ["o_custkey"], 8,
        )
        write_bucketed(
            cust.select("c_custkey", "c_mktsegment"),
            "b_customer", ["c_custkey"], 8,
        )
        joined = colocated_join(
            spark,
            "b_orders",
            "b_customer",
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        # disable broadcast so the co-location (not a broadcast) is what
        # removes the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and the result is right
            n = joined.count()
            expected = (
                orders.join(cust, orders.o_custkey == cust.c_custkey).count()
            )
            assert n == expected
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")

    def test_mismatched_buckets_reshuffle_one_side(self, spark):
        orders = load_table(spark, SF, "orders")
        cust = load_table(spark, SF, "customer")
        write_bucketed(
            orders.select("o_orderkey", "o_custkey"), "b_orders16", ["o_custkey"], 16
        )
        write_bucketed(
            cust.select("c_custkey"), "b_customer8", ["c_custkey"], 8
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_orders16").join(
                spark.table("b_customer8"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # exactly one side re-shuffles (the smaller bucket count)
            assert plan.count("Exchange") == 1, plan
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS b_orders16")
            spark.sql("DROP TABLE IF EXISTS b_customer8")
