"""ops/cdc.py apply_changelog: latest-wins fold semantics.

Key claims: the highest-seq op decides (including late deletes and
insert-after-delete resurrection), payload columns always come from ONE
row (struct fold), and folding is incremental — a folded snapshot plus
the changelog tail folds to the same result as the full log.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.ops.cdc import apply_changelog

SCHEMA = "key long, seq long, op string, val string"


def _fold(df):
    return {
        r.key: (r.seq, r.op, r.val)
        for r in apply_changelog(df, ("key",), "seq", "op").collect()
    }


def test_latest_wins_and_deletes_drop(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "I", "a"), (1, 2, "U", "b"),          # plain upsert
            (2, 1, "I", "x"), (2, 9, "D", None),         # late delete wins
            (3, 5, "D", None), (3, 6, "I", "back"),      # resurrection
            (4, 7, "I", "only"),
        ],
        SCHEMA,
    )
    assert _fold(log) == {
        1: (2, "U", "b"),
        3: (6, "I", "back"),
        4: (7, "I", "only"),
    }


def test_payload_is_row_consistent(spark):
    # op and val must come from the SAME winning row, never a column mix
    log = spark.createDataFrame(
        [(1, s, "U", f"v{s}") for s in range(50)], SCHEMA
    )
    assert _fold(log) == {1: (49, "U", "v49")}


def test_fold_is_incremental(spark):
    rows = [
        (k, s, "D" if (k + s) % 7 == 0 else "U", f"{k}.{s}")
        for k in range(20)
        for s in range(10)
    ]
    log = spark.createDataFrame(rows, SCHEMA)
    full = _fold(log)

    head = log.filter(F.col("seq") < 5)
    tail = log.filter(F.col("seq") >= 5)
    # a folded snapshot is itself a changelog (seq = fold watermark) —
    # but deletes must SURVIVE into the snapshot for incremental use,
    # so refold from the unfiltered latest-per-key head instead
    snapshot = head.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("key").orderBy(F.col("seq").desc())
        ),
    ).filter(F.col("rn") == 1).drop("rn")
    assert _fold(snapshot.unionByName(tail)) == full
