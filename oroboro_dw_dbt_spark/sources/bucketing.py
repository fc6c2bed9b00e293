"""Bucketed tables: pre-shuffled storage for co-located joins.

THE storage-level lever for repeated big-table joins at 100 TB: write
both sides bucketed (and sorted) by the join key into the session
catalog, and every subsequent equi-join on that key is planned WITHOUT
an Exchange on either side — the shuffle was paid once at write time
and amortized over every downstream join/aggregation on the same key.
Spark's bucketing (hash(key) mod n_buckets at write; scan reports the
HashPartitioning to the planner) is the classic Hive-style co-location,
asserted shuffle-free in tests/test_bucketing.py.

Rules of engagement encoded here:
- both sides must agree on n_buckets (mismatch → one side re-shuffles);
- sortBy the key too, so SortMergeJoin also skips its Sort;
- bucket pruning applies to point filters on the bucket key;
- at 100 TB pick n_buckets so one bucket of the big fact fits an
  executor core's memory (e.g. 100 TB / 8192 buckets ≈ 12 GB splits —
  bucket count is a capacity decision, not cosmetics).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Remove a managed-table directory orphaned by a previous process.

    ``mode("overwrite").saveAsTable`` replaces a table the CATALOG knows
    about, but a fresh session starts with an empty in-memory catalog
    while the warehouse directory persists on disk — Spark then refuses
    the write with LOCATION_ALREADY_EXISTS. Only a local filesystem
    warehouse is handled (the test/driver topology); on a cluster the
    table lives in a real metastore and overwrite works as documented.
    """
    if spark.catalog.tableExists(table):
        return  # catalog-managed: overwrite handles replacement itself
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if warehouse.scheme not in ("", "file"):
        return
    stale = Path(warehouse.path) / table.split(".")[-1].lower()
    if stale.exists():
        shutil.rmtree(stale, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table,
    replacing any previous version."""
    _clear_stale_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key (``on``
    is a column-name list or a join Column expression). The physical
    plan contains no Exchange (verified in tests) — the scan's bucket
    layout satisfies both sides' distribution requirements."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
