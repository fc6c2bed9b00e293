"""Table maintenance: small-file compaction for parquet-dir tables.

The reference never needs this (BigQuery manages storage), but any
long-lived parquet/Delta/Iceberg warehouse does: incremental builds and
streaming upserts (engine/dag.py incremental mode, streaming/jobs.py
foreachBatch merge) each land a shuffle-partition's worth of files per
run, and after N runs a 100 TB table is millions of KB-sized files —
scan planning and footer reads start to dominate query time, and the
NameNode/object-store listing itself becomes the bottleneck.

``compact_table`` rewrites a table directory into ≈``target_file_bytes``
files without changing its rows: size the output file count from the
current on-disk bytes, round-robin ``repartition`` for even files (a
deliberate full shuffle — evenness is the point; ``coalesce`` would be
cheaper but inherits upstream skew into the merged files), and swap the
rewrite in through the format's backup-first ``replace`` so readers
never observe a missing table. Hive-partitioned tables instead
repartition ON the partition columns so each value's rows co-locate and
the rewrite lands one file per partition value — there, the hive layout
itself is the size policy.

At 100 TB this is the same job, run per partition as a background
maintenance task (Delta OPTIMIZE / Iceberg rewrite_data_files do exactly
this behind their commit protocol); the engine-level seam means the
policy — target size, which partitions, when — lives here, not in every
producer.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from oroboro_dw_dbt_spark.engine.table_format import LocalParquetFormat

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # parquet sweet spot


def data_file_stats(path: Path) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a parquet table dir."""
    files = [p for p in Path(path).rglob("*.parquet") if p.is_file()]
    return len(files), sum(p.stat().st_size for p in files)


def compact_table(
    spark: SparkSession,
    path: str | Path,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: tuple[str, ...] = (),
    table_format: LocalParquetFormat | None = None,
) -> DataFrame:
    """Rewrite the table at ``path`` into ≈target-sized files and return
    the compacted frame. Row-preserving by construction (the rewrite is
    a plain scan → repartition → write of the same data; the test
    asserts hash equality) and crash-safe via the staged swap."""
    path = Path(path)
    fmt = table_format or LocalParquetFormat()
    n_files, total_bytes = data_file_stats(path)
    if n_files == 0:
        raise FileNotFoundError(f"no parquet data files under {path}")
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = fmt.read(spark, path)
    if partition_by:
        # hive-partitioned table: co-locate each partition value so the
        # rewrite lands ONE file per value (a round-robin repartition
        # would scatter every value across all tasks and multiply files
        # instead of merging them); the hive partitioning itself is the
        # size policy here
        df = df.repartition(*partition_by)
    else:
        df = df.repartition(n_out)
    staging = path.with_name(path.name + "__compacting")
    fmt.write(df, staging, partition_by)
    fmt.replace(staging, path)
    return fmt.read(spark, path)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance: merge additive state, never rescan
# ---------------------------------------------------------------------------
def merge_additive_state(
    state,  # DataFrame | None — the existing aggregate table
    delta,  # DataFrame — the new batch, PRE-AGGREGATED to the same grain
    keys: list[str],
    sum_cols: list[str],
):
    """One maintenance step of an incrementally-maintained aggregate:
    union the old per-key state with the delta's partial aggregate and
    re-aggregate. Correct exactly when every measure is ADDITIVE
    (counts, integer/decimal sums — the delta-merge is then associative
    and equals a full recompute bit-for-bit); non-additive measures
    need mergeable sketch state instead (see sk_hll_merge for distinct
    counts).

    Scale: the step's cost is O(|state keys| + |delta|) — a 100 TB
    event history updates its aggregate mart from each day's delta
    without ever rescanning the history. The one shuffle is on the
    grain keys; partial aggregation combines map-side first."""
    from pyspark.sql import functions as F

    if state is None:
        merged = delta
    else:
        merged = state.unionByName(delta)
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
