"""Snapshot diff: generate the changelog between two table versions.

The inverse of ops/cdc.py's apply_changelog — given two committed
versions of a :class:`ManifestParquetFormat` table, emit the I/U/D
rows that transform one into the other (the Delta Change-Data-Feed /
Iceberg changelog-scan shape, computed after the fact from immutable
snapshots, so it works on tables that never recorded CDC at write
time).

Spark-first: ONE full-outer join on the key. Both sides are snapshots
of the same table, so at 100 TB they share layout — written bucketed
(sources/bucketing.py) the join is Exchange-free; otherwise it is one
co-partitioned SMJ. Change detection is a column-wise null-safe
comparison inside the join projection — no hashing round trip, no
second pass.
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_diff(
    spark: SparkSession,
    fmt,
    path: Path,
    v_old: int,
    v_new: int,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Changelog from version ``v_old`` to ``v_new``: one row per key
    inserted ('I'), deleted ('D'), or with any ``compare_cols`` value
    changed ('U' — null-safe comparison, so NULL→value and value→NULL
    both count). Unchanged keys are absent. Output columns:
    ``*key_cols, op, old_<c>, new_<c>`` for each compare column.

    Keys must be unique per snapshot (table-format tables are
    key-addressed; duplicate keys would make "the" old row undefined).
    """
    old = fmt.read(spark, path, version=v_old).select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    new = fmt.read(spark, path, version=v_new).select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = old.join(new, list(key_cols), "full_outer")
    # explicit presence markers (full outer leaves them NULL on the
    # absent side) — an all-NULL payload row is still "present"
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(False),  # empty compare_cols → presence-only (I/D) diff
    )
    op = (
        F.when(~in_old, "I").when(~in_new, "D").when(changed, "U")
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *key_cols,
            "op",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
