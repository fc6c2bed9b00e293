"""Round-7 wave: trained-cell semantic dedup.

- ``dd_semdedup_ivf`` — SemDeDup (Abbas et al. 2023) over TRAINED
  Voronoi cells instead of random hyperplanes: a fixed-point Lloyd
  step (seeds = the C lowest vec_ids, one exact integer centroid
  update, re-assign) partitions the embedding space, then the same
  lowest-id dominance anti-join as ``dd_semdedup`` runs within each
  cell. This is the VERDICT r06 contract item ("at 100 TB the bucket
  id comes from a trained k-means assignment") turned into checked
  code: the quantizer is genuinely data-trained, yet every step is
  exact integer arithmetic (floor-scaled micro coordinates, BIGINT
  sums, truncating division — DuckDB ``//`` and Spark ``div`` both
  truncate toward zero), so a DuckDB oracle certifies it bit-for-bit.
  Real k-means (pyspark.ml, float, seeded) stays the production fit
  path in similarity/search.py:ivf_topk; this entry certifies the
  identical downstream plan with a reproducible quantizer.

House rules (operators/catalog.py): the dominance stage reuses
``dd_semdedup``'s exact cosine spelling (hoisted per-vector norms,
round-6dp-then-compare). The reference (3 BigQuery models) has no
analog; SURVEY §6 scopes the dedup family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table
from oroboro_dw_dbt_spark.similarity.search import _as_double

_IVF_TAU = 0.4  # same dominance threshold as dd_semdedup
_IVF_DIM = 64
_IVF_CELLS = 16  # floor; sf0.01 (500 vectors) stays exactly here
_IVF_FP = 1_000_000  # micro fixed-point scale for the quantizer


def ivf_cells_for(n: int) -> int:
    """C ≈ sqrt(N/8), floored at the sf0.01 value (16).

    sqrt-scaling balances the two stage costs: nearest-centroid
    assignment is N·C dot products and within-cell pair work is
    ~N²/C, so C ∝ √N puts both at N^1.5 (the classic IVF operating
    point; FAISS's rule of thumb is C = O(√N)). At 100 TB the
    assignment stage itself goes hierarchical — probe only the
    nearest coarse centroids, as ivf_topk does for queries — which
    restores ~linear total work with this same downstream plan."""
    return max(_IVF_CELLS, math.ceil(math.sqrt(n / 8)))


def _int_dot(a, b):
    """Exact BIGINT dot product via a sequential fold (order-pinned)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


@query(
    "dd_semdedup_ivf",
    # Quantizer arithmetic is exact end-to-end: micro-scaled BIGINT
    # coordinates (floor is rounding-mode-free, unlike round), BIGINT
    # sums (order-free), truncating integer division (DuckDB // ≡
    # Spark div), and argmin ties broken by cell id. list_dot_product
    # returns DOUBLE but every value here is < 2^53 — exact.
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {_IVF_FP}) AS BIGINT)) AS vi
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cell, vi AS si,
             CAST(list_dot_product(vi, vi) AS BIGINT) AS sn
      FROM v WHERE vec_id < {_IVF_CELLS}
    ),
    a0 AS (
      SELECT vec_id, cell FROM (
        SELECT x.vec_id, s.cell,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY s.sn - 2 * CAST(list_dot_product(x.vi, s.si)
                                          AS BIGINT),
                          s.cell) AS rk
        FROM v x CROSS JOIN seeds s) t WHERE rk = 1
    ),
    dims AS (
      SELECT a0.cell, u.i AS i,
             CAST(CAST(sum(x.vi[u.i]) AS BIGINT)
                  // CAST(count(*) AS BIGINT) AS BIGINT) AS cd
      FROM v x JOIN a0 ON a0.vec_id = x.vec_id,
           unnest(range(1, {_IVF_DIM} + 1)) AS u(i)
      GROUP BY a0.cell, u.i
    ),
    cents AS (
      SELECT cell, list(cd ORDER BY i) AS c FROM dims GROUP BY cell
    ),
    cents2 AS (
      SELECT cell, c, CAST(list_dot_product(c, c) AS BIGINT) AS cn
      FROM cents
    ),
    a1 AS (
      SELECT vec_id, cell FROM (
        SELECT x.vec_id, s.cell,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY s.cn - 2 * CAST(list_dot_product(x.vi, s.c)
                                          AS BIGINT),
                          s.cell) AS rk
        FROM v x CROSS JOIN cents2 s) t WHERE rk = 1
    ),
    b AS (
      SELECT x.vec_id, a1.cell, x.v,
             sqrt(list_dot_product(x.v, x.v)) AS nrm
      FROM v x JOIN a1 ON a1.vec_id = x.vec_id
    ),
    dom AS (
      SELECT c.vec_id AS victim, CAST(min(q.vec_id) AS BIGINT) AS removed_by
      FROM b q JOIN b c ON q.cell = c.cell AND q.vec_id < c.vec_id
      WHERE round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
            >= {_IVF_TAU}
      GROUP BY c.vec_id
    )
    SELECT b.vec_id, CAST(b.cell AS INT) AS cell,
           CAST(d.victim IS NULL AS INT) AS keep,
           d.removed_by
    FROM b LEFT JOIN dom d ON d.victim = b.vec_id
    """,
    survey_ref="beyond-reference: SemDeDup over trained Voronoi cells "
    "— exact fixed-point Lloyd quantizer + the dd_semdedup dominance "
    "plan (VERDICT r06 Missing #3 / Next #7)",
)
def dd_semdedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over one-Lloyd-step k-means cells, exact.

    Plan: (1) seeds = C lowest vec_ids (C = ivf_cells_for(count),
    pinned at 16 for sf0.01 so the certified hash never moves);
    (2) assign every vector to its nearest seed — a broadcast
    crossJoin of C KB-scale centroid rows, argmin as a map-side-
    combinable min_by, never a window sort over N·C rows;
    (3) exact integer centroid update (BIGINT dim sums are
    order-free; truncating div matches DuckDB //); (4) re-assign to
    the updated centroids; (5) dd_semdedup's dominance anti-join
    within each cell. More Lloyd iterations loop stages 3-4 with the
    same plan; the float production fit is ivf_topk's pyspark.ml
    KMeans — this entry certifies the downstream plan with a
    quantizer both engines can compute bit-identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        _as_double("embedding").alias("v"),
    ).withColumn(
        "vi",
        F.transform(
            F.col("v"), lambda x: F.floor(x * _IVF_FP).cast("long")
        ),
    )
    n_cells = ivf_cells_for(v.count())
    v = v.localCheckpoint(eager=True)  # reused by 4 downstream stages

    seeds = v.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"),
        F.col("vi").alias("si"),
    )
    seeds = seeds.withColumn(
        "sn", _int_dot(F.col("si"), F.col("si"))
    )

    def assign(cent_df, vec_col, nrm_col):
        scored = v.crossJoin(F.broadcast(cent_df)).select(
            "vec_id",
            "cell",
            (F.col(nrm_col) - 2 * _int_dot(F.col("vi"), F.col(vec_col))).alias(
                "score"
            ),
        )
        return scored.groupBy("vec_id").agg(
            F.min_by("cell", F.struct("score", "cell")).alias("cell")
        )

    a0 = assign(seeds, "si", "sn")

    dims = (
        v.join(a0, "vec_id")
        .select("cell", F.posexplode("vi").alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.expr("sum(x) div count(*)").alias("cd"))
    )
    cents = dims.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cd"))),
            lambda s: s["cd"],
        ).alias("c")
    )
    cents = cents.withColumn("cn", _int_dot(F.col("c"), F.col("c")))

    a1 = assign(cents, "c", "cn")

    from oroboro_dw_dbt_spark.dedup.semdedup import dominance_pairs

    b = (
        v.join(a1, "vec_id")
        .select("vec_id", "cell", "v")
        .localCheckpoint(eager=True)
    )
    dom = dominance_pairs(b, "cell", _IVF_TAU)
    return b.join(dom, F.col("vec_id") == F.col("victim"), "left").select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.col("victim").isNull().cast("int").alias("keep"),
        "removed_by",
    )
