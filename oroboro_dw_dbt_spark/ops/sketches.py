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


def _cm_bucket(col: str, i: int, width: int, salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.lit(i), F.col(col))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def countmin_counters(
    df: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """The count-min sketch STATE: (row, bucket, n) counters. Exposed
    separately from the estimator because the state is the mergeable
    unit — per-shard counter tables sum per (row, bucket) into exactly
    the whole-data table (integer adds are associative), which is what
    lets sketch state pre-aggregate map-side and roll up across
    days/partitions (certified by sk_countmin_merge)."""
    counters = None
    src = df.select(col)
    for i in range(depth):
        c = (
            src.groupBy(_cm_bucket(col, i, width, salt).alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .withColumn("row", F.lit(i))
        )
        counters = c if counters is None else counters.unionByName(c)
    return counters


def countmin_estimates(
    df: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch frequency estimates for every distinct value of
    ``col`` — deterministic (md5-derived row hashes), so unlike most
    sketch implementations the whole construction is exactly restatable
    in SQL and oracle-checkable, while keeping the defining properties:
    ``depth × width`` integer counters of FIXED size regardless of
    cardinality, mergeable across partitions (counter addition), and
    estimates that never undercount (min over d rows of an
    overcounting counter each).

    Plan: one explode-free pass builds the counter table (groupBy on
    (row, bucket) — at most depth×width groups, map-side combined);
    estimating joins each distinct value to its d counters and takes
    the min. At 100 TB the counter table is KBs — THE point: frequency
    estimates whose state does not grow with vocabulary."""
    counters = countmin_counters(df, col, depth=depth, width=width, salt=salt)
    rows = list(range(depth))
    bucket = lambda i: _cm_bucket(col, i, width, salt)  # noqa: E731
    distinct = df.select(col).distinct()
    est = None
    for i in rows:
        e = (
            distinct.withColumn("row", F.lit(i))
            .withColumn("bucket", bucket(i))
            .join(counters, ["row", "bucket"])
            .select(col, F.col("n").alias("est"))
        )
        est = e if est is None else est.unionByName(e)
    return est.groupBy(col).agg(F.min("est").cast("bigint").alias("cm_estimate"))
