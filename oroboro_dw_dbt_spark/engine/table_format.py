"""Pluggable table-storage formats for the DAG executor's sinks.

The reference materializes marts as BigQuery tables (dbt_project.yml:
15-17), where replace-on-write is atomic. Local parquet directories
aren't: a naive ``rmtree(old) + rename(staging)`` has a crash window
that destroys the existing table. This seam isolates that concern:

- :class:`LocalParquetFormat` — the test-env implementation. Writes
  plain parquet dirs; ``replace`` renames the old table aside, moves
  the staging dir into place, and only then deletes the backup, so a
  crash at any single step leaves either the old or the new table
  recoverable on disk (the ``__old`` backup is restored on failure).
- A production deployment implements the same three methods with
  Delta/Iceberg, whose commit protocol makes ``replace`` truly atomic
  and adds time travel — no executor-side changes needed.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class LocalParquetFormat:
    """Parquet-directory tables with a backup-first replace."""

    def write(
        self, df: DataFrame, path: Path, partition_by: tuple[str, ...] = ()
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(path))

    def read(self, spark: SparkSession, path: Path) -> DataFrame:
        return spark.read.parquet(str(path))

    def replace(self, staging: Path, final: Path) -> None:
        """Swap ``staging`` into ``final``'s place without a window in
        which the table is simply gone: old → ``__old`` backup, staging
        → final, then drop the backup; on a failed swap the backup is
        renamed back."""
        backup = final.with_name(final.name + "__old")
        if backup.exists():
            shutil.rmtree(backup)
        final.rename(backup)
        try:
            staging.rename(final)
        except OSError:
            backup.rename(final)  # restore the original table
            raise
        shutil.rmtree(backup)
