"""Embedding corpus statistics: per-label centroids.

The building block of IVF training, cluster drift monitoring, and
class-prototype retrieval. The plan is the scale-correct one: posexplode
to (label, pos, value) rows, aggregate with map-side partial sums on
(label, pos) — shuffle volume is O(labels × dim), never O(rows) — then
reassemble the ordered centroid array per label.

Determinism: float summation order varies with partitioning/retries, so
a double SUM can flip the 6th decimal between runs (the exact hazard
that made round 1's flagship models hash-flaky). Values are therefore
micro-quantized FIRST — ``floor(x·10⁶ + 0.5)`` as BIGINT — and summed
exactly in integers; the mean divides once at the end. Both engines and
every retry agree bit-for-bit, at the cost of centroid inputs being
rounded to 1e-6 (document-scale noise, orders below embedding noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def label_centroids(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """(label, n_vectors, centroid array<double> rounded to 6) — the
    element-wise mean of each label's vectors over micro-quantized
    values (exact integer sums → order-independent)."""
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast("bigint"),
            )
        ).alias("pos", "xi"),
    )
    per_pos = exploded.groupBy("label", "pos").agg(
        F.sum("xi").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_pos.groupBy("label")
        .agg(
            F.max("n").cast("bigint").alias("n_vectors"),
            F.array_sort(F.collect_list(F.struct("pos", "sx"))).alias("_ps"),
        )
        .select(
            "label",
            "n_vectors",
            F.transform(
                F.col("_ps"),
                lambda s: F.round(
                    s["sx"].cast("double") / (F.col("n_vectors") * MICRO), 6
                ),
            ).alias("centroid"),
        )
    )
