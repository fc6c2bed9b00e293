"""Scale-pattern ops: salting equivalence and sketch error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.ops import (
    approx_distinct_by,
    approx_quantiles_by,
    salted_join,
    two_phase_distinct_agg,
)
from oroboro_dw_dbt_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


class TestSalting:
    def test_salted_join_equals_plain_join(self, spark):
        events = load_table(spark, SF, "events")
        dim = load_table(spark, SF, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_name"
        )
        plain = events.join(dim, "user_id").select("event_id", "c_name")
        salted = salted_join(events, dim, "user_id", salt_buckets=5).select(
            "event_id", "c_name"
        )
        assert plain.count() == salted.count()
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

    def test_salted_left_join_keeps_unmatched(self, spark):
        events = load_table(spark, SF, "events")
        # user_id 0 exists in events but custkey starts at 1
        dim = load_table(spark, SF, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_name"
        )
        plain = events.join(dim, "user_id", "left")
        salted = salted_join(events, dim, "user_id", "left", salt_buckets=3)
        assert salted.count() == plain.count() == events.count()
        assert (
            salted.filter(F.col("c_name").isNull()).count()
            == plain.filter(F.col("c_name").isNull()).count()
        )

    def test_salted_join_spreads_hot_key_partitions(self, spark):
        """Adversarial skew (one key owns 50% of rows): the bare join
        key funnels the hot key into ONE shuffle partition, the salted
        key spreads it across the salt buckets — measured as the max
        per-partition row count of the exact repartitioning each join
        would shuffle with. Results must stay identical to the plain
        join (rewrite is semantics-free)."""
        n = 200_000
        big = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("payload"),
        )
        small = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )

        def max_partition_rows(df, *cols):
            return (
                df.repartition(8, *cols)
                .groupBy(F.spark_partition_id().alias("p"))
                .count()
                .agg(F.max("count"))
                .first()[0]
            )

        plain_max = max_partition_rows(big, "k")
        assert plain_max >= n // 2  # the hot key's rows all co-locate

        salt = (F.abs(F.xxhash64(*big.columns)) % 8).alias("_salt")
        salted_max = max_partition_rows(big.withColumn("_salt", salt), "k", "_salt")
        # hot key now spans 8 buckets: worst partition carries less
        # than 60% of the unsalted hot partition (measured ~44%)
        assert salted_max < plain_max * 0.6, (plain_max, salted_max)

        plain = big.join(small, "k", "inner")
        salted = salted_join(big, small, "k", salt_buckets=8)
        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).count() == 0

    def test_aqe_splits_unsalted_skew_join(self, spark):
        """The other half of the skew story (SCALE.md): leave the join
        UNSALTED and let AQE's runtime skew-join split handle the hot
        key — asserted on the final adaptive plan, which must carry the
        SortMergeJoin(skew=true) / AQEShuffleRead skewed markers once
        the hot partition exceeds the (lowered) skew thresholds."""
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            n = 300_000
            big = spark.range(n).select(
                F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
                F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("payload"),
            )
            small = spark.range(1000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
            joined = big.join(small, "k", "inner")
            rows = joined.collect()  # executes THIS df's adaptive plan
            # k=0 matches n/2 rows; odd keys 1..999 match one row each
            assert len(rows) == n // 2 + 500
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan
            assert "AQEShuffleRead skewed" in plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def test_two_phase_distinct_matches_exact(self, spark):
        events = load_table(spark, SF, "events")
        got = two_phase_distinct_agg(
            events,
            "event_type",
            "user_id",
            aggs={"n_events": F.count(F.lit(1)).cast("bigint")},
        )
        exact = events.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_distinct"),
            F.count(F.lit(1)).alias("n_events"),
        )
        g = {r.event_type: (r.n_distinct, r.n_events) for r in got.collect()}
        e = {r.event_type: (r.n_distinct, r.n_events) for r in exact.collect()}
        assert g == e


class TestSketches:
    def test_hll_within_rsd(self, spark):
        events = load_table(spark, SF, "events")
        approx = {
            r.event_type: r.approx_distinct
            for r in approx_distinct_by(events, "event_type", "user_id").collect()
        }
        exact = {
            r.event_type: r.n
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for k, n in exact.items():
            # rsd=0.02 → 5σ bound; tiny groups get an absolute floor
            assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)

    def test_quantiles_rank_error(self, spark):
        events = load_table(spark, SF, "events")
        qs = approx_quantiles_by(events, "event_type", "value")
        assert set(qs.columns) == {"event_type", "q_50", "q_95", "q_99"}
        row = qs.filter(F.col("event_type").isNotNull()).first()
        vals = [
            r.value
            for r in events.filter(F.col("event_type") == row.event_type)
            .select("value")
            .collect()
        ]
        vals.sort()
        # GK guarantees rank error ≤ n/accuracy; check the 50th pctile
        # lands within 1% of the true rank
        import bisect

        rank = bisect.bisect_left(vals, row.q_50)
        assert abs(rank - 0.5 * len(vals)) <= max(2, 0.01 * len(vals)) + 1


class TestTemporalJoins:
    def test_asof_basic_and_no_prior(self, spark):
        from oroboro_dw_dbt_spark.ops import asof_join

        left = spark.createDataFrame(
            [(1, 10.0, "L1"), (1, 20.0, "L2"), (2, 5.0, "L3")],
            "k long, ts double, lbl string",
        )
        right = spark.createDataFrame(
            [(1, 10.0, "R@10"), (1, 15.0, "R@15"), (2, 6.0, "R@6")],
            "k long, ts double, val string",
        )
        out = {
            r.lbl: (r.asof_ts, r.asof_val)
            for r in asof_join(
                left, right, key="k", right_payload=("val",)
            ).collect()
        }
        assert out["L1"] == (10.0, "R@10")  # inclusive ts_right <= ts_left
        assert out["L2"] == (15.0, "R@15")  # latest prior, not first
        assert out["L3"] == (None, None)  # right row is AFTER left → null

    def test_asof_forward_direction(self, spark):
        from oroboro_dw_dbt_spark.ops import asof_join

        left = spark.createDataFrame(
            [(1, 10.0, "L1"), (1, 20.0, "L2"), (2, 5.0, "L3")],
            "k long, ts double, lbl string",
        )
        right = spark.createDataFrame(
            [(1, 10.0, "R@10"), (1, 15.0, "R@15"), (2, 3.0, "R@3")],
            "k long, ts double, val string",
        )
        out = {
            r.lbl: (r.next_ts, r.next_val)
            for r in asof_join(
                left,
                right,
                key="k",
                right_payload=("val",),
                direction="forward",
                prefix="next_",
            ).collect()
        }
        assert out["L1"] == (10.0, "R@10")  # inclusive ts_right >= ts_left
        assert out["L2"] == (None, None)  # nothing at-or-after
        assert out["L3"] == (None, None)  # right row is BEFORE left → null

        import pytest as _pytest

        with _pytest.raises(ValueError, match="direction"):
            asof_join(left, right, key="k", direction="sideways")

    def test_bucketed_range_join_inclusive_bounds(self, spark):
        from oroboro_dw_dbt_spark.ops import bucketed_range_join

        points = spark.createDataFrame(
            [(1, 100.0), (2, 600.0), (3, 601.0), (4, 99.9)],
            "pid long, ts double",
        )
        intervals = spark.createDataFrame(
            [(100.0, 600.0)], "lo double, hi double"
        )
        got = sorted(
            r.pid
            for r in bucketed_range_join(
                points, intervals, "ts", "lo", "hi", bucket_s=250
            ).collect()
        )
        assert got == [1, 2]  # lo and hi inclusive; outside both ends dropped


class TestGuards:
    def test_salted_join_rejects_outer_modes(self, spark):
        import pytest

        from oroboro_dw_dbt_spark.ops import salted_join

        df = spark.createDataFrame([(1, "a")], "k long, v string")
        for how in ("right", "full", "outer"):
            with pytest.raises(ValueError, match="inner"):
                salted_join(df, df, on="k", how=how)

    def test_ivf_query_cap(self, spark):
        import pytest

        from oroboro_dw_dbt_spark.similarity import ivf_topk

        emb = load_table(spark, SF, "embeddings")
        with pytest.raises(ValueError, match="max_queries"):
            ivf_topk(emb, list(range(2000)), k=5)

    def test_asof_payload_carried_atomically(self, spark):
        """The latest right row's genuine NULL payload must SURVIVE —
        per-column carry would back-fill it from an older right row."""
        from oroboro_dw_dbt_spark.ops import asof_join

        left = spark.createDataFrame([(1, 20.0, "L")], "k long, ts double, lbl string")
        right = spark.createDataFrame(
            [(1, 5.0, "old_val"), (1, 15.0, None)],
            "k long, ts double, val string",
        )
        row = asof_join(left, right, key="k", right_payload=("val",)).first()
        assert row["asof_ts"] == 15.0
        assert row["asof_val"] is None  # NOT "old_val"


class TestGraphOps:
    def test_connected_components_path_and_clique(self, spark):
        """A 5-node path (diameter 4 — forces multiple label sweeps), a
        triangle, and an isolated edge must each collapse to min-id."""
        from oroboro_dw_dbt_spark.ops import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5),      # path
             (10, 11), (11, 12), (10, 12),        # triangle
             (20, 21)],                           # edge
            "src long, dst long",
        )
        got = {r.node: r.comp for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                       10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


class TestSampling:
    def test_hash_split_deterministic_and_near_fraction(self, spark):
        from oroboro_dw_dbt_spark.ops import hash_split

        docs = load_table(spark, SF, "documents")
        s1 = {r.doc_id: r.split for r in hash_split(docs, ["doc_id"], 0.1).collect()}
        s2 = {r.doc_id: r.split for r in hash_split(docs, ["doc_id"], 0.1).collect()}
        assert s1 == s2  # retry-stable
        frac = sum(v == "test" for v in s1.values()) / len(s1)
        assert 0.03 <= frac <= 0.2  # ~10% with small-n noise
        # a different salt re-deals the split
        s3 = {r.doc_id: r.split for r in hash_split(docs, ["doc_id"], 0.1, salt="v2").collect()}
        assert s3 != s1

    def test_stratified_sample_counts(self, spark):
        from oroboro_dw_dbt_spark.ops import stratified_sample

        docs = load_table(spark, SF, "documents")
        out = stratified_sample(docs, "lang", ["doc_id"], 5)
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        per_stratum = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        for lang, n in counts.items():
            assert n == min(5, per_stratum[lang])
