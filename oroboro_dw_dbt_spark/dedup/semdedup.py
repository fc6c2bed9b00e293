"""Shared SemDeDup dominance kernel: per-cell GEMM, exact policy.

Both semantic-dedup entries (``dd_semdedup``'s LSH cells,
``dd_semdedup_ivf``'s trained Voronoi cells) end in the same stage:
within each cell, a vector is removed iff some LOWER-id cell-mate is
cosine-≥-τ similar, and ``removed_by`` is the lowest such id. Round 6
spelled that as a bucket self-equi-join with a per-pair ``zip_with``
fold — the right *shape* (never all-pairs), but the per-pair array
fold costs ~µs where BLAS costs ~ns: the 10× probe measured the fold
at 10M pairs dominating the wall (SCALE.md r07). This kernel keeps
the identical shuffle (one hash partition by cell — exactly the
equi-join's) and scores each cell's pairs with ONE ``mat @ mat.T``
inside ``applyInPandas``, the same Arrow/GEMM idiom the certified
``ss_lsh_matmul`` family uses (similarity/search.py:272).

Semantics are pinned to the oracle: cosines round HALF_UP to 6dp
before the τ compare (functions/rounding.py — np.round is banker's
and is banned), ids sort ascending so "lowest dominator" is a first-
True argmax, and the τ decision is the only thing that leaves the
kernel — GEMM's pairwise summation differs from the oracle's
sequential fold only below 1e-15, which cannot move a 6dp rounding
except exactly at a midpoint boundary (not present in any certified
value set; the sf0.01 gate hashes would catch one).

Memory: one cell's cosine matrix is occ² doubles — the occupancy
bound IS the operator contract (planes ≈ log2(N/occ) for LSH, cells
∝ corpus for IVF), so the matrix stays MB-scale at any corpus size;
a degenerate corpus that defeats the bucketing (all vectors
identical) would concentrate one giant cell and must be exact-deduped
first (dd_exact) — stated, not silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dominance_pairs(b: DataFrame, cell_col: str, tau: float) -> DataFrame:
    """(victim, removed_by) per dominated vector.

    ``b`` must carry ``vec_id`` (long), ``v`` (array<double>), and
    ``cell_col``. One shuffle: hash partition by cell (the equi-join's
    own exchange); each cell is scored by a single GEMM.
    """
    import numpy as np
    import pandas as pd

    from oroboro_dw_dbt_spark.functions.rounding import np_round_half_up

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "victim": pd.Series([], dtype="int64"),
                    "removed_by": pd.Series([], dtype="int64"),
                }
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        # f64 compute regardless of STORAGE dtype: callers may ship v
        # as array<float> (half the checkpoint bytes — the sf1000 heap
        # ceiling, SCALE.md) and the upcast is deterministic, so the
        # certified double-input entries are bit-unchanged (no-op)
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        cos = np_round_half_up((mat @ mat.T) / np.outer(nrm, nrm))
        # tri[i, j] True ⇔ ids[i] < ids[j] (ids ascending) and cos ≥ τ:
        # column j's first True row is its lowest-id dominator.
        tri = np.triu(cos >= tau, 1)
        has = tri.any(axis=0)
        first = tri.argmax(axis=0)
        return pd.DataFrame(
            {
                "victim": pd.Series(ids[has], dtype="int64"),
                "removed_by": pd.Series(ids[first[has]], dtype="int64"),
            }
        )

    return (
        b.select(F.col(cell_col).alias("_cell"), "vec_id", "v")
        .groupBy("_cell")
        .applyInPandas(kernel, "victim long, removed_by long")
    )
