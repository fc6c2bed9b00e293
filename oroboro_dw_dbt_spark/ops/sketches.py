"""Approximate (sketch) aggregates — the one-pass, bounded-memory path.

At 100 TB an exact COUNT(DISTINCT) or percentile is a full shuffle of
the distinct values; the sketch versions are single-pass with fixed
per-group state (HyperLogLog++ registers / KLL-style quantile buffers),
mergeable across partitions — the canonical scan→partial→merge shape.

These are approximations, so there is no cross-engine oracle hash
(DuckDB's HLL differs bit-wise); the catalog records them rows-only and
tests/test_training_ops.py asserts relative-error bounds against the
exact Spark answer instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_key: str, col: str, rsd: float = 0.02
) -> DataFrame:
    """(group_key, approx_distinct) via HyperLogLog++ with target
    relative standard deviation ``rsd``."""
    return df.groupBy(group_key).agg(
        F.approx_count_distinct(col, rsd).cast("bigint").alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_key: str,
    col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """(group_key, q_50, q_95, ...) via Greenwald-Khanna approximate
    percentiles; ``accuracy`` bounds rank error at 1/accuracy."""
    out = df.groupBy(group_key).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
        ).alias("_qs")
    )
    cols = [F.col(group_key)]
    for i, q in enumerate(quantiles):
        cols.append(F.col("_qs")[i].alias(f"q_{int(q * 100)}"))
    return out.select(*cols)
