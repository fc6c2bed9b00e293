"""engine/diff.py snapshot_diff: the changelog between two versions.

The defining property: folding diff(v1→v2) onto v1 with
ops/cdc.py-style latest-wins semantics reproduces v2 exactly —
diff and apply are inverses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.engine import ManifestParquetFormat
from oroboro_dw_dbt_spark.engine.diff import snapshot_diff


def _write_versions(spark, tmp_path):
    fmt = ManifestParquetFormat()
    table = tmp_path / "t"
    v1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, None, "c"), (4, 40, None)],
        "k long, x long, s string",
    )
    v2 = spark.createDataFrame(
        [
            (1, 10, "a"),        # unchanged -> absent from the diff
            (2, 99, "b"),        # x changed -> U
            (3, None, "c2"),     # s changed (x still NULL) -> U
            # 4 deleted -> D
            (5, 50, "e"),        # inserted -> I
        ],
        "k long, x long, s string",
    )
    fmt.write(v1, table)
    fmt.write(v2, table)
    return fmt, table, v1, v2


def test_diff_classifies_insert_update_delete(spark, tmp_path):
    fmt, table, _v1, _v2 = _write_versions(spark, tmp_path)
    d = snapshot_diff(spark, fmt, table, 1, 2, ("k",), ("x", "s"))
    got = {r.k: (r.op, r.new_x, r.new_s) for r in d.collect()}
    assert got == {
        2: ("U", 99, "b"),
        3: ("U", None, "c2"),  # NULL payload column: null-safe compare
        4: ("D", None, None),
        5: ("I", 50, "e"),
    }
    assert 1 not in got  # unchanged rows never appear


def test_diff_folded_onto_v1_reproduces_v2(spark, tmp_path):
    fmt, table, v1, v2 = _write_versions(spark, tmp_path)
    d = snapshot_diff(spark, fmt, table, 1, 2, ("k",), ("x", "s"))
    upserts = d.filter(F.col("op") != "D").select(
        "k", F.col("new_x").alias("x"), F.col("new_s").alias("s")
    )
    deleted = {r.k for r in d.filter(F.col("op") == "D").collect()}
    changed = {r.k for r in d.collect()}
    rebuilt = (
        v1.filter(~F.col("k").isin(changed))  # untouched keys carry over
        .unionByName(upserts)
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, v2.collect())
    )
    assert deleted == {4}


def test_diff_of_identical_versions_is_empty(spark, tmp_path):
    fmt = ManifestParquetFormat()
    table = tmp_path / "same"
    df = spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    fmt.write(df, table)
    fmt.write(df, table)
    assert snapshot_diff(spark, fmt, table, 1, 2, ("k",), ("x",)).count() == 0
