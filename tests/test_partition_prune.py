"""Partition pruning physically skips non-matching dirs
(eng_partitioned_prune's plan contract)."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned(spark):
    path = Path(tempfile.mkdtemp(prefix="prune_test_")) / "events_by_day"
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("event_date")
        .parquet(str(path))
    )
    return path


def test_week_filter_binds_as_partition_filter(spark, partitioned):
    week = spark.read.parquet(str(partitioned)).filter(
        (F.col("event_date") >= "2024-01-08")
        & (F.col("event_date") <= "2024-01-14")
    )
    plan = week._jdf.queryExecution().executedPlan().toString()
    # the filter must appear under PartitionFilters (file-listing time),
    # not as a post-scan data Filter
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def _scan_metric(df, name: str) -> int:
    """Value of a FileSourceScan metric after executing ``df``'s own
    query execution (df.count() would build a DIFFERENT plan whose
    metrics stay zero — collect() drives the cached one)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    return leaves.apply(0).metrics().apply(name).value()


def test_pruned_scan_reads_only_matching_partitions(spark, partitioned):
    week = spark.read.parquet(str(partitioned)).filter(
        F.col("event_date") == "2024-01-10"
    )
    assert _scan_metric(week, "numPartitions") == 1
    # and the unpruned table really had 30 day-dirs to skip
    assert _scan_metric(spark.read.parquet(str(partitioned)), "numPartitions") == 30


def test_partition_values_roundtrip(spark, partitioned):
    """Row counts per day match the raw table (no row lands in the
    wrong dir)."""
    raw = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .count()
    )
    part = (
        spark.read.parquet(str(partitioned))
        .groupBy(F.col("event_date").cast("string").alias("d"))
        .count()
    )
    assert {(r["d"], r["count"]) for r in raw.collect()} == {
        (r["d"], r["count"]) for r in part.collect()
    }
