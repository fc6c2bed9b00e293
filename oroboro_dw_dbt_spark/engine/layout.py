"""Z-order (Morton-curve) file layout: multi-dimensional data skipping.

Hive partitioning (`eng_partitioned_prune`) prunes on ONE dimension at
file-listing time; queries filtering on a second column still read every
file of the surviving partitions. Z-ordering interleaves the bits of two
(or more) columns into one sort key, so sorting files by it clusters
BOTH dimensions at once: every file covers a small rectangle of the
(x, y) space, and a 2-D box predicate overlaps few files — parquet
row-group min/max statistics then skip the rest. This is the layout
technique behind Delta's OPTIMIZE ZORDER BY and Iceberg's z-ordered
rewrites, implemented here as a pure Column expression + a range-
partitioned sorted write (no engine support needed).

The z-value arithmetic is integer bit interleaving — deterministic and
engine-independent, so the DuckDB oracle can recompute it exactly
(`zorder_oracle_expr` emits the matching SQL).

Scale: the write is one range-partition shuffle + local sort, the same
cost as any sorted write; `repartitionByRange` samples the z-key to cut
balanced file boundaries, so skewed dimensions still give evenly-sized
files. Pruning effectiveness is data-dependent (it degrades gracefully
toward a plain sort on x as y's cardinality collapses); the pytest
asserts the rectangle property on real file footers rather than
trusting the math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: x occupies even bit positions, y odd. Callers band
    their columns into [0, 2**bits) first (e.g. ``col % 256`` or a
    bucketized range)."""
    z = F.lit(0).cast("bigint")
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftright(xb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_oracle_expr(x_sql: str, y_sql: str, bits: int = 8) -> str:
    """The exact SQL twin of :func:`zorder_value` for the DuckDB oracle
    (plain integer division/modulo — no engine bit builtins needed)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_sql}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({y_sql}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files sorted along the
    Morton curve of (x, y). The z-key is a throwaway sort expression —
    it is not stored in the files."""
    z = zorder_value(x, y, bits)
    (
        df.repartitionByRange(n_files, z)
        .sortWithinPartitions(z)
        .write.mode("overwrite")
        .parquet(path)
    )
