"""Write-Audit-Publish: data tests gate the commit, not the write.

The reference runs dbt tests AFTER materializing (dbt's default: bad
data is already live when the test fails). WAP inverts that — the
snapshot is staged invisible, audited in place, and the atomic pointer
swap happens only if every test passes; a failed audit leaves readers
on the previous version and the staged snapshot as a vacuum-reclaimable
orphan. This is the Iceberg WAP / Delta constraint-check shape built on
ManifestParquetFormat's stage/commit split.

Scale: the audit reads the STAGED files (no extra copy); each DataTest
is one aggregation/anti-join over them. Cost is one test-suite pass per
publish — the same work dbt does post-hoc, moved before the commit.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from oroboro_dw_dbt_spark.engine.table_format import ManifestParquetFormat
from oroboro_dw_dbt_spark.engine.tests import DataTest, TestResult


def publish_with_audit(
    spark: SparkSession,
    fmt: ManifestParquetFormat,
    path: Path,
    df: DataFrame,
    tests: Sequence[DataTest],
    partition_by: tuple[str, ...] = (),
    stats_cols: tuple[str, ...] = (),
) -> tuple[bool, list[TestResult]]:
    """Stage ``df``, run ``tests`` against the staged snapshot, commit
    iff all pass. Returns (published, per-test results); on False the
    table is untouched and the stage is an orphan for vacuum.

    Concurrency note: a vacuum running DURING the audit would reclaim
    the in-flight stage (it is uncommitted and not a branch head) and
    fail the audit's scans — don't vacuum concurrently, or call
    ``vacuum(..., stage_grace_s=...)`` with a grace longer than your
    slowest audit."""
    version = fmt.stage(df, path, partition_by, stats_cols)
    staged = fmt.read(spark, path, version=version)
    results = [t.run(staged) for t in tests]
    if all(r.passed for r in results):
        fmt.commit_staged(path, version)
        return True, results
    return False, results
