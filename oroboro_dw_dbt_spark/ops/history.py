"""Warehouse history operators: SCD type-2 snapshot builds and MERGE
upsert semantics.

The reference is a dbt project; dbt's lifecycle surface includes
snapshots (type-2 change capture, `dbt snapshot`) and incremental
merges. The reference repo itself materializes only views/tables
(dbt_project.yml:15-17), so these are the beyond-reference completion
of that lifecycle story, expressed as pure DataFrame plans:

- :func:`scd2_from_events` — collapse a change-event stream into
  type-2 validity intervals. One shuffle on the business key; both
  windows (change detection, interval close) share the same
  partitioning+ordering, so Spark plans a single sort and reuses it.
- :func:`merge_upsert` — ANSI MERGE decision table via one full-outer
  key-equi join: insert / update / unchanged / keep (target-only).
  Shuffles both sides on the key; no broadcast assumption, so it holds
  when both sides are 100 TB-scale. At that scale the physical write
  would go through a Delta/Iceberg MERGE (the engine's TableFormat
  seam); this operator is the deciding plan, which is the part Spark
  owns either way.

Determinism (SURVEY §2.5 W4): every window here orders by the event
timestamp WITH the event id as a pinned tiebreak, and attribute
comparison is null-safe (`<=>` / IS DISTINCT FROM in the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_events(
    events: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Type-2 history of ``attr`` per ``key`` from a change-event feed.

    Consecutive events with an unchanged attribute are collapsed
    (null-safely); each surviving change opens an interval
    ``[valid_from, valid_to)`` closed by the next change, with
    ``is_current`` on the open tail and a 1-based ``version``.
    """
    order = [F.col(ts).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    changed = (
        events.select(key, attr, ts, tiebreak)
        .withColumn("_prev", F.lag(attr).over(w))
        .withColumn("_first", F.row_number().over(w) == 1)
        .filter(F.col("_first") | ~F.col(attr).eqNullSafe(F.col("_prev")))
    )
    # same partitioning AND ordering as `w` → the sort is reused
    w2 = Window.partitionBy(key).orderBy(*order)
    return changed.select(
        F.col(key),
        F.col(attr),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE decision plan: full-outer join ``target`` with ``source``
    on ``keys`` and emit the merged row plus its ``action``:

    - ``insert``    — key only in source
    - ``update``    — key in both, any ``compare_cols`` differ (null-safe)
    - ``unchanged`` — key in both, all ``compare_cols`` equal
    - ``keep``      — key only in target (no WHEN NOT MATCHED BY SOURCE
      clause: the row survives untouched)

    Source wins on matched rows. ``compare_cols`` defaults to every
    non-key column shared by both sides.
    """
    if compare_cols is None:
        shared = [c for c in target.columns if c in set(source.columns)]
        compare_cols = [c for c in shared if c not in keys]
    # presence markers, not key-null checks: rows with NULL keys must
    # still classify correctly (they eqNullSafe-match across sides)
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    in_t = F.col("t._t_present").isNotNull()
    in_s = F.col("s._s_present").isNotNull()

    def _differs() -> Column:
        d = F.lit(False)
        for c in compare_cols:
            d = d | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
        return d

    action = (
        F.when(~in_t, F.lit("insert"))
        .when(~in_s, F.lit("keep"))
        .when(_differs(), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    merged_keys = [F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys]
    merged_vals = [
        F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in compare_cols
    ]
    return t.join(s, cond, "full_outer").select(
        *merged_keys, *merged_vals, action.alias("action")
    )
