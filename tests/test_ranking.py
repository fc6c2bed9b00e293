"""Two-phase exact ranking (ops/ranking.py) — the scale rewrite of the
few-distinct-groups window sort (SCALE.md "Window-family caveats")."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import QUERIES
from oroboro_dw_dbt_spark.ops import ranking_family, two_phase_rank
from oroboro_dw_dbt_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


class TestTwoPhaseRank:
    def test_matches_window_rank_suite(self, spark):
        key = lambda r: (r.o_orderpriority, r.rnk, r.o_orderkey)  # noqa: E731
        a = sorted(QUERIES["w_rank_suite"].builder(spark, SF).collect(), key=key)
        b = sorted(QUERIES["w_rank_twophase"].builder(spark, SF).collect(), key=key)
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_rank_exact_on_constructed_groups(self, spark):
        rows = [("a", i, i * 10) for i in range(1, 8)] + [("b", 1, 5)]
        df = spark.createDataFrame(rows, "g string, id int, v int")
        got = {
            (r.g, r.id): r.rnk
            for r in two_phase_rank(df, ["g"], ["v", "id"], n_ranges=4).collect()
        }
        assert got == {("a", i): i for i in range(1, 8)} | {("b", 1): 1}

    def test_family_arithmetic_matches_windows_on_edge_groups(self, spark):
        """ntile remainder split, n=1 group (percent_rank must be 0),
        and n < tiles — checked against Spark's own window functions."""
        rows = (
            [("ten", i, float(i)) for i in range(10)]
            + [("one", 0, 3.0)]
            + [("three", i, float(-i)) for i in range(3)]
        )
        df = spark.createDataFrame(rows, "g string, id int, v double")
        got = {
            (r.g, r.id): (r.rnk, r.drnk, r.quartile, r.pct_rank, r.cume)
            for r in ranking_family(df, ["g"], ["v", "id"], n_ranges=4).collect()
        }
        w = Window.partitionBy("g").orderBy("v", "id")
        want = {
            (r.g, r.id): (r.rnk, r.drnk, r.quartile, r.pct_rank, r.cume)
            for r in df.select(
                "g",
                "id",
                F.rank().over(w).cast("bigint").alias("rnk"),
                F.dense_rank().over(w).cast("bigint").alias("drnk"),
                F.ntile(4).over(w).cast("int").alias("quartile"),
                F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                F.round(F.cume_dist().over(w), 6).alias("cume"),
            ).collect()
        }
        assert got == want

    def test_sort_is_distributed_not_single_task(self, spark):
        """The plan property the rewrite exists for: the data shuffle is
        range partitioning + a (pid, group) hash — NEVER a shuffle whose
        partition count collapses to the group cardinality. The orders
        table has 5 priorities; the naive window sorts 5 single tasks."""
        orders = load_table(spark, SF, "orders")
        df = two_phase_rank(
            orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
            ["o_orderpriority"],
            ["o_totalprice", "o_orderkey"],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan, plan
        assert "hashpartitioning(_pid" in plan, plan
