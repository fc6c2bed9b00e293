"""Temporal join operators Spark lacks as built-ins: as-of join and
(bucketed) range join — each expressed as a composition of DataFrame
ops that keeps a single hash-shuffle plan, never a nested loop.

As-of join (the union trick): to attach, for every left row, the most
recent right row with the same key and ts_right <= ts_left, tag both
inputs, union them, and take a running ``last(right_payload,
ignorenulls=True)`` over (key) ordered by (ts, tag) with right rows
sorted before left rows at equal ts (inclusive semantics). One shuffle
on key; no join at all. This is how kdb/QuestDB/Flink users expect
``asof`` to behave and matches DuckDB's ASOF JOIN, which serves as the
oracle.

Bucketed range join: joining points to intervals on ``ts BETWEEN lo AND
hi`` with no equi-key is a nested loop in Spark (BroadcastNestedLoop —
fine for a tiny interval side, quadratic death otherwise). The scale
path: quantize time into fixed buckets, explode each interval into the
buckets it covers, equi-join points to intervals on the bucket id, then
apply the exact BETWEEN as a residual filter. Shuffle is proportional to
points + interval-bucket expansions; pick ``bucket_s`` near the median
interval length so expansion stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``right_ts`` and ``right_payload`` of
    the matched right row with the same ``key`` (NULLs when no such
    row): ``direction='backward'`` (default) matches the LATEST right
    row with ts <= left ts; ``'forward'`` matches the EARLIEST right
    row with ts >= left ts (both inclusive — same as DuckDB/pandas
    merge_asof directions). Left columns pass through unchanged.
    Forward is the same one-shuffle union trick with the window order
    reversed.

    The whole right row is carried as ONE struct through a single
    ``last(ignorenulls=True)``: per-column lasts would back-fill a NULL
    payload cell from an OLDER right row, mixing columns of different
    rows — DuckDB ASOF JOIN (the oracle) takes the matched row
    atomically, genuine NULLs included."""
    payload = [c for c in right_payload if c != right_ts]
    struct_type = T.StructType(
        [T.StructField("_ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_ts).alias("_ts"), *[F.col(c) for c in payload]
        ).alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l_ = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(struct_type).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    order = (
        [F.col("_ts").asc(), F.col("_tag").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_tag").asc()]
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l_)
        .withColumn("_r", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .drop("_tag", "_ts", key)
    )
    for c in left.columns:
        out = out.withColumnRenamed(f"_l_{c}", c)
    return out.select(
        *left.columns,
        F.col("_r._ts").alias(f"{prefix}ts"),
        *[F.col(f"_r.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_s: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Equi-join-shaped point-in-interval join: points.ts ∈ [lo, hi].
    Returns points columns + intervals columns (inner) — one output row
    per (point, covering interval) pair, like the BETWEEN join it
    replaces. Quantizes to ``bucket_s``-second buckets."""
    if how != "inner":
        raise ValueError("bucketed_range_join supports inner only")
    b = lambda c: (F.col(c).cast("double") / bucket_s).cast("long")  # noqa: E731
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(b(lo), b(hi))),
    )
    pt = points.withColumn("_bucket", b(point_ts))
    return (
        pt.join(iv, "_bucket")
        .filter((F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi)))
        .drop("_bucket")
    )
