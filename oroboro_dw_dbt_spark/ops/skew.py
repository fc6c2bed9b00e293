"""Skew-mitigation operators: explicit salting.

AQE's skew-join split (on in session.py) handles most hot-key joins at
runtime, but two shapes still benefit from *plan-level* salting at
100 TB, and both are result-identical to their plain forms — which is
how the catalog oracle-checks them:

- ``salted_join``: a shuffle join where one key owns a huge share of
  the rows. The big (skewed) side gets a uniform salt in [0, B); the
  small side is replicated B× (one copy per salt value); the join key
  becomes (key, salt). The hot key's rows now land on B partitions
  instead of one. Replication cost: B× the SMALL side only.
- ``two_phase_distinct_agg``: COUNT(DISTINCT x) GROUP BY k with few
  groups — the final agg has ≤ |k| partitions doing all the work. Phase
  one dedups (k, x) pairs (cardinality-bounded shuffle spread over
  hash(x), not k alone); phase two counts per k. Spark's partial
  aggregation does this for algebraic aggs automatically; DISTINCT is
  the case that needs the explicit rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on column ``on``, salted B ways.

    The salt is derived from a stable hash of the skewed side's full row
    (xxhash64 of all columns) rather than rand(): deterministic across
    retries/speculative tasks, which rand() is not — a correctness
    issue, not a style one, under task retry with non-idempotent sinks.

    Only inner/left are supported: the salting rewrite replicates the
    small side B times, so a right/full join would emit each UNMATCHED
    small-side row B times (matched rows are fine in every mode) —
    silently wrong results, hence the hard error.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "outer modes would duplicate unmatched replicated rows"
        )
    salt = (F.abs(F.xxhash64(*skewed.columns)) % salt_buckets).alias("_salt")
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def two_phase_distinct_agg(
    df: DataFrame,
    group_key: str,
    distinct_col: str,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Exact ``COUNT(DISTINCT distinct_col) GROUP BY group_key`` as an
    explicit two-phase plan, plus optional algebraic ``aggs`` computed
    in the same pass. Returns (group_key, n_distinct, **aggs)."""
    pairs = df.groupBy(group_key, distinct_col).agg(
        *[
            expr.alias(f"_p_{name}")
            for name, expr in (aggs or {}).items()
        ]
    )
    # phase 2: per-pair partials combine into per-group finals; the
    # distinct count is now a plain size-of-group count
    finals = [F.count(F.lit(1)).cast("bigint").alias("n_distinct")]
    for name in aggs or {}:
        # partials were computed per (key, distinct) pair; recombining
        # is only valid for sum/count-like partials — caller's contract
        finals.append(F.sum(f"_p_{name}").alias(name))
    return pairs.groupBy(group_key).agg(*finals)
