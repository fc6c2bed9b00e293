"""Two-phase exact ranking: global ranks without a single-task sort.

A window like ``rank() OVER (PARTITION BY p ORDER BY k)`` hash-shuffles
on ``p`` and sorts each group in ONE task. When ``p`` has few distinct
values (w_rank_suite partitions orders by a 5-value priority column),
each group is a single-task sort at any scale — the documented honest
limit at SCALE.md "Window-family caveats". This module is that caveat's
cure, for the tie-free case:

1. ``repartitionByRange`` on the composite (p, k...) key — the range
   partitioner gives totally ordered partition ranges, each a bounded
   slice of the data, so the sort work spreads over all tasks;
2. capture ``spark_partition_id()`` while still in the ranged stage,
   then ``row_number() OVER (PARTITION BY pid, p ORDER BY k)`` — a
   balanced shuffle on (pid, p), never a giant single group;
3. aggregate per-(pid, p) row counts — a TINY table (n_ranges × groups
   rows) — turn them into cumulative offsets per group with a window
   over that tiny table, and broadcast-join them back:
   ``rank = offset + local_row_number``.

Because range partition index increases with the composite key, every
row in a lower pid orders before every same-group row in a higher pid,
so the offset arithmetic is exact. With a TIE-FREE total order
(w_rank_suite pins ... , o_orderkey) row_number IS rank, dense_rank ==
rank, and the remaining ranking family is pure arithmetic over
(rank, group count): percent_rank = (rank-1)/(n-1), cume_dist = rank/n,
and ntile(t) from the standard remainder split. The catalog entry
``w_rank_twophase`` is certified against the SAME oracle SQL as
``w_rank_suite`` — the rewrite is proven hash-identical, not argued.

Cost at 100 TB: one range shuffle + one hash shuffle of the data (vs
one hash shuffle for the naive window) buys per-task sorts bounded by
partition size instead of group size. The count table stays KB-scale
regardless of data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def two_phase_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    n_ranges: int = 32,
    out: str = "rnk",
) -> DataFrame:
    """Append exact rank ``out`` per ``part_cols`` group under the
    TIE-FREE total order ``order_cols`` (caller must include a unique
    tiebreaker — with ties, row_number semantics apply within an
    arbitrary-but-deterministic order of the range partitioner).

    Also appends ``_grp_n`` (the group's total row count) so callers
    can derive percent_rank / cume_dist / ntile without re-shuffling.
    """
    ranged = df.repartitionByRange(
        n_ranges, *[F.col(c) for c in part_cols], *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())

    w_local = Window.partitionBy("_pid", *part_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))

    counts = local.groupBy("_pid", *part_cols).agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        *part_cols,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy(*part_cols)).alias("_grp_n"),
    )

    return (
        local.join(F.broadcast(offsets), on=["_pid", *part_cols])
        .withColumn(out, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def ranking_family(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    n_tiles: int = 4,
    n_ranges: int = 32,
) -> DataFrame:
    """The full w_rank_suite surface (rank, dense_rank, ntile,
    percent_rank, cume_dist) computed by two-phase ranking — exact under
    a tie-free order, with every function past ``rank`` derived
    arithmetically from (rank, group count)."""
    ranked = two_phase_rank(df, part_cols, order_cols, n_ranges=n_ranges)
    rnk, n = F.col("rnk"), F.col("_grp_n")
    base, rem = (n / n_tiles).cast("bigint"), n % n_tiles
    boundary = rem * (base + 1)
    ntile = F.when(
        rnk <= boundary, F.ceil(rnk / (base + 1))
    ).otherwise(rem + F.ceil((rnk - boundary) / base))
    return (
        ranked.withColumn("drnk", rnk)  # tie-free: dense_rank == rank
        .withColumn("quartile", ntile.cast("int"))
        .withColumn(
            "pct_rank",
            F.when(n > 1, F.round((rnk - 1) / (n - 1), 6)).otherwise(F.lit(0.0)),
        )
        .withColumn("cume", F.round(rnk / n, 6))
        .drop("_grp_n")
    )
