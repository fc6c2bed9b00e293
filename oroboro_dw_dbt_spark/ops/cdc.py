"""Change-data-capture apply: fold a changelog into its latest snapshot.

The reference's warehouse rebuilds models from full sources each run
(models/*.sql are full-refresh views/tables); a production feed at
100 TB instead lands as an append-only changelog (op, seq, payload)
that must be folded latest-wins into the current snapshot — the Debezium
/ Delta CDF consumption shape.

Spark-first design: latest-per-key is ONE aggregation with
``max_by(struct(payload), seq)`` — partial aggregation combines
map-side, so the shuffle carries one row per key per map task, not the
whole changelog. A window row_number would sort every key's full
history; the agg only tracks the running max. Deletes survive to the
agg (a later D must beat earlier U's) and are dropped after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changelog(
    changes: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins fold of a changelog; rows whose final op is a delete
    are dropped. ``seq_col`` must be unique per key (a commit LSN /
    Kafka offset); ties would make the winner undefined, so the payload
    rides in ONE struct — even under a tie the result is one consistent
    row, never a column mix of two versions.

    Scale: single hash-partition shuffle on the key; state per key is
    one struct. At 100 TB the same fold runs incrementally: snapshot
    UNION changelog-since through this fn, because an already-folded
    snapshot is a changelog whose seq is its fold watermark.
    """
    payload = [c for c in changes.columns if c not in key_cols]
    folded = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(seq_col)).alias("__last")
    )
    out = folded.select(*key_cols, "__last.*")
    return out.filter(F.col(op_col) != delete_op)
