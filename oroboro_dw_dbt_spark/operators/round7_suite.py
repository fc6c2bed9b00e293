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
from typing import Callable

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
    """Exact BIGINT dot product via a sequential fold (order-pinned).
    Operands cast to long BEFORE multiplying so array<int> inputs (the
    compact storage the sf1000 probe ships to halve its checkpoint)
    never overflow 32-bit products; a no-op for array<long> inputs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


# Conservative slack (micro-units) absorbing sqrt's ≤0.5-ulp rounding
# in the pruning bounds (values ≤ 1.6e7 → ulp ≈ 4e-9; 1e-3 is ~10⁶×
# that). Slack only ever ADMITS extra candidates — the exact integer
# argmin downstream is unaffected, so correctness never rests on it.
_HIER_EPS = 1e-3


# Flat/hierarchical dispatch boundary: below this many centroids the
# whole centroid table is a KB-scale driver constant (256 cells × 64
# dims × 8 B = 131 KB) and the two-level probe's fixed price (pivot
# selection, grouping, radii, cogroup exchanges) buys nothing — the
# r07 flat path is ~2× faster at sf0.1 (VERDICT r08 What's-wrong #3).
# Above it the hierarchical probe caps the broadcast at O(√C).
_FLAT_MAX_CELLS = 256

# Per-task candidate budget for the salted cogroup (ADVICE r08): a
# group key's whole candidate set must never ride one pandas frame —
# on no-pruning geometry that is ~N rows of dim-64 int64 on ONE task.
# ~200k rows × 64 × 8 B ≈ 100 MB per task, comfortably inside an
# executor; the salt count scales with the corpus to hold this.
_SALT_TARGET_ROWS = 200_000


def assign_cells(
    v: DataFrame, cent_df: DataFrame, n_cells: int, n_rows: int | None = None
) -> DataFrame:
    """EXACT nearest-centroid assignment, size-dispatched.

    Small C (≤ ``_FLAT_MAX_CELLS``): :func:`flat_assign` — the whole
    centroid table is collected once (KB-scale) and every vector is
    scored by one int64 GEMM inside ``mapInPandas``; ZERO shuffles.
    Large C: :func:`hier_assign` — the two-level triangle-inequality
    probe that never broadcasts more than O(√C) rows. Both paths are
    exact with the identical lowest-cell tie-break, so the dispatch
    boundary cannot move a result bit (pinned by
    tests/test_round7.py's flat-vs-hier equality test)."""
    if n_cells <= _FLAT_MAX_CELLS:
        return flat_assign(v, cent_df)
    return hier_assign(v, cent_df, n_cells, n_rows=n_rows)


def flat_assign(v: DataFrame, cent_df: DataFrame) -> DataFrame:
    """Exact nearest-centroid assignment with a driver-collected
    centroid table: C·dim int64s (KBs at the dispatch boundary) ride
    the task closure, every vector batch is scored by one int64 GEMM,
    argmin over cell-ascending columns IS the lowest-id tie-break.
    No shuffle, no cogroup — the whole assignment is map-side."""
    import numpy as np
    import pandas as pd

    rows = cent_df.select("cell", "c", "cn").orderBy("cell").collect()
    spark = v.sparkSession
    if not rows:  # empty corpus/centroids: empty assignment
        return spark.createDataFrame([], "vec_id long, cell long")
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    cm = np.array([r["c"] for r in rows], dtype=np.int64)
    cn = np.array([r["cn"] for r in rows], dtype=np.int64)

    def it_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.stack(pdf["vi"].to_numpy()).astype(np.int64, copy=False)
            dots = _exact_int_gemm(vm, cm)
            scores = cn[None, :] - 2 * dots
            j = scores.argmin(axis=1)  # first-min = lowest cell id
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cell": cells[j],
                }
            )

    return v.select("vec_id", "vi").mapInPandas(it_kernel, "vec_id long, cell long")


def _exact_int_gemm(vm, cm):
    """``vm @ cm.T`` in exact int64, BLAS-accelerated when safe.

    numpy int64 matmul has NO BLAS kernel (scalar triple loop); float64
    dgemm computes the SAME integers exactly whenever every dot
    product's partial sums stay below 2^53 — true by a wide margin for
    micro-fixed-point coordinates (|vi| ≤ ~1e6, dim 64 → |dot| ≤
    ~6.4e13 ≈ 2^46). The bound is CHECKED per batch, falling back to
    the exact int64 loop on data that could overflow the mantissa."""
    import numpy as np

    amax = (
        max(int(np.abs(vm).max(initial=0)), 1)
        * max(int(np.abs(cm).max(initial=0)), 1)
        * vm.shape[1]
    )
    if amax < 2**53:
        return np.rint(vm.astype(np.float64) @ cm.astype(np.float64).T).astype(
            np.int64
        )
    return vm @ cm.T  # pragma: no cover - beyond the quantizer's range


def hier_assign(
    v: DataFrame, cent_df: DataFrame, n_cells: int, n_rows: int | None = None
) -> DataFrame:
    """EXACT nearest-centroid assignment with a two-level probe:
    broadcast O(√C) coarse rows, not all C centroids.

    The flat spelling broadcasts every centroid to every vector — at
    100 TB with C ∝ √N centroids that broadcast grows to ~GB (VERDICT
    r07 Missing #2). Here the centroids themselves are grouped under
    G = ⌈√C⌉ coarse pivots (the G lowest cell ids), each group carrying
    its covering radius r_g = max distance pivot→member. Per vector:

    1. score the G pivots map-side (ONE broadcast row holding the
       pivot array — √C·dim ints, KBs where the flat broadcast was
       MBs/GBs) and form U = min_g(d_g + r_g), an upper bound on the
       true nearest-centroid distance;
    2. keep only groups whose lower bound d_g − r_g ≤ U (triangle
       inequality — the pruned groups PROVABLY contain no winner,
       and every tie of the winning score survives, so the lowest-id
       tie-break is preserved bit-for-bit);
    3. cogroup the surviving (vec_id, group) pairs with the
       group-keyed centroid table and score each group with ONE
       int64 ``vi_mat @ c_mat.T`` (Arrow batches, exact integer
       matmul — all values < 2⁶³, numpy integer matmul never leaves
       int64); per-group winner = argmin over centroid columns
       PRE-SORTED by cell id, so numpy's first-min rule IS the
       lowest-id tie-break;
    4. one map-side-combinable min_by folds the per-group winners
       into the global (score, cell) argmin per vector.

    Bounds use double sqrt on EXACT integer squared distances (all
    < 2⁵³), padded by ``_HIER_EPS``; the scoring never leaves BIGINT,
    so the assignment — and the certified sf0.01 hash — is identical
    to the flat crossJoin's by construction, at any C. The GEMM step
    replaces a per-pair Catalyst ``aggregate(zip_with(...))`` fold
    that allocated a 64-element array per (vector, centroid) pair —
    the measured dominant term of the sf10 chained-pipeline run —
    with the same Arrow/GEMM idiom as the dominance kernel
    (dedup/semdedup.py).
    Salted cogroup (ADVICE r08): a group key's candidate set can be
    ~N rows on no-pruning geometry — too big for one pandas frame on
    one task. Candidates are salted by ``hash(vec_id) % S`` and the
    KB-scale centroid side is replicated per salt, so each task holds
    ≤ ~``_SALT_TARGET_ROWS`` candidates while every vector still meets
    all of its group's centroids. The per-(g,salt) winners fold into
    the global argmin through the same min_by — subgroup minima of a
    min are the min, and the (score, cell) struct ordering preserves
    the lowest-id tie-break bit-for-bit at any S (S=1 ≡ unsalted; the
    salted-equality test pins it).

    ``cent_df``: (cell, c array<long>, cn long). ``v`` must carry
    ``xn`` = vi·vi; ``n_rows`` (if known) sizes the salt count."""
    import numpy as np
    import pandas as pd

    cand, grouped = _hier_parts(v, cent_df, n_cells)
    salts = _salt_count(v, n_rows)
    return _score_groups(cand, grouped.select("g", "cell", "c", "cn"), salts)


def _salt_count(v: DataFrame, n_rows: int | None) -> int:
    # Unknown n_rows → 1 salt (ADVICE r09: defaulting to
    # defaultParallelism made every direct library call pay the salted
    # plan — explode-replicated centroid side + wider cogroup — even on
    # tiny inputs; S=1 ≡ unsalted by the pinned equality). Callers at
    # scale pass n_rows (the core paths do, off a checkpointed count)
    # so the candidate-volume bound actually sizes the salt.
    if n_rows is None:
        return 1
    return max(1, min(512, -(-n_rows // _SALT_TARGET_ROWS)))


def _score_groups(cand: DataFrame, cent_side: DataFrame, salts: int) -> DataFrame:
    """Fold (vec_id, vi, g) candidates against the g-keyed centroid
    table into the exact per-vector (score, cell) argmin: a salted
    cogroup (each task holds ≤ ~``_SALT_TARGET_ROWS`` candidates, the
    KB-scale centroid side replicated per salt) scoring each group
    with ONE int64 GEMM, then one map-side-combinable min_by. Lowest-
    cell ties are preserved at any salt count: the kernel's first-min
    over cell-ascending columns is the lowest id within a task, and
    the (score, cell) struct ordering keeps it across tasks."""
    import numpy as np
    import pandas as pd

    def kernel(pdf_v: pd.DataFrame, pdf_c: pd.DataFrame) -> pd.DataFrame:
        if len(pdf_v) == 0 or len(pdf_c) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="int64"),
                    "cell": pd.Series([], dtype="int64"),
                }
            )
        pdf_c = pdf_c.sort_values("cell")  # first-min argmin = lowest id
        vm = np.stack(pdf_v["vi"].to_numpy()).astype(np.int64, copy=False)
        cm = np.stack(pdf_c["c"].to_numpy()).astype(np.int64, copy=False)
        cn = pdf_c["cn"].to_numpy(dtype=np.int64)
        cells = pdf_c["cell"].to_numpy(dtype=np.int64)
        # TILE the candidate rows: a whole group's score matrix can be
        # GBs (the sf100 pathology: one skewed group scored 235k
        # vectors × 6.8k centroids — a 13 GB int64 matrix, and the
        # kernel's three temporaries tripled it; the task spent its
        # wall in allocation and page faults, not FLOPs). ~4M-element
        # tiles (32 MB) keep every temporary cache-resident; per-row
        # argmin is independent, so tiling is exact.
        tile = max(256, (1 << 22) // max(1, len(cm)))
        out_score = np.empty(len(vm), dtype=np.int64)
        out_cell = np.empty(len(vm), dtype=np.int64)
        for s in range(0, len(vm), tile):
            vt = vm[s : s + tile]
            scores = cn[None, :] - 2 * _exact_int_gemm(vt, cm)
            j = scores.argmin(axis=1)
            r = np.arange(len(vt))
            out_score[s : s + len(vt)] = scores[r, j]
            out_cell[s : s + len(vt)] = cells[j]
        return pd.DataFrame(
            {
                "vec_id": pdf_v["vec_id"].to_numpy(dtype=np.int64),
                "score": out_score,
                "cell": out_cell,
            }
        )

    if salts > 1:
        cand = cand.withColumn("s", F.pmod(F.hash("vec_id"), F.lit(salts)))
        cent_side = cent_side.withColumn(
            "s", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
        )
        per_group = (
            cand.groupby("g", "s")
            .cogroup(cent_side.groupby("g", "s"))
            .applyInPandas(kernel, "vec_id long, score long, cell long")
        )
    else:
        per_group = (
            cand.groupby("g")
            .cogroup(cent_side.groupby("g"))
            .applyInPandas(kernel, "vec_id long, score long, cell long")
        )
    return per_group.groupBy("vec_id").agg(
        F.min_by("cell", F.struct("score", "cell")).alias("cell")
    )


def _kcenter_pivots(cent_df: DataFrame, n_groups: int) -> DataFrame:
    """Deterministic greedy k-center pivot selection (Gonzalez 1985)
    over a BOUNDED sample of centroids.

    Pivot quality decides pruning power: group radii shrink only when
    each pivot anchors a geometrically compact group, and the first-G-
    ids choice can land every pivot in one corner. Greedy farthest-
    point gives the classic 2-approximation to the optimal covering
    radius. Runs on the driver over ≤ max(64, 4G) lowest-id centroid
    rows — O(√C) rows collected, the same driver budget ivf_topk
    already spends on its centroid list — with float64 distances
    (selection needs determinism, not exactness: ANY pivot set is
    correct, the bounds stay conservative) and index-order tie-breaks.
    Start point = lowest cell id."""
    import numpy as np

    sample_n = max(64, 4 * n_groups)
    rows = (
        cent_df.orderBy("cell").limit(sample_n).select("cell", "c", "cn")
    ).collect()
    spark = cent_df.sparkSession
    if not rows:  # empty corpus: empty pivots → empty assignment
        return spark.createDataFrame([], "g long, sg array<long>, sgn long")
    k = min(n_groups, len(rows))
    mat = np.array([r["c"] for r in rows], dtype=np.float64)
    chosen = [0]
    d = ((mat - mat[0]) ** 2).sum(axis=1)
    d[0] = -1.0
    for _ in range(k - 1):
        i = int(np.argmax(d))  # ties → first index → lowest cell id
        chosen.append(i)
        d = np.minimum(d, ((mat - mat[i]) ** 2).sum(axis=1))
        d[i] = -1.0
    return spark.createDataFrame(
        [(rows[i]["cell"], rows[i]["c"], rows[i]["cn"]) for i in chosen],
        "g long, sg array<long>, sgn long",
    )


def hier_candidate_count(v: DataFrame, cent_df: DataFrame, n_cells: int) -> int:
    """(vector, centroid) pairs the probe actually scores (the GEMM
    kernel performs Σ_g n_g·m_g multiplies — exactly this join's row
    count) — the flat path always scores N·C; the gap is the measured
    pruning."""
    cand, grouped = _hier_parts(v, cent_df, n_cells)
    return cand.join(grouped.select("g", "cell"), "g").count()


def _hier_parts(
    v: DataFrame, cent_df: DataFrame, n_cells: int
) -> tuple[DataFrame, DataFrame]:
    """The probe stage of :func:`hier_assign`: the surviving
    (vec_id, vi, g) candidate frame and the group-keyed centroid
    table (cell, c, cn, g, _d2)."""
    n_groups = max(2, math.isqrt(max(1, n_cells - 1)) + 1)  # ⌈√C⌉
    pivots = _kcenter_pivots(cent_df, n_groups)
    # group every centroid under its nearest pivot (exact integer
    # argmin, pivot id breaks ties — any grouping is CORRECT, this one
    # is deterministic); C×G rows, both sides KB/MB-scale. Spelled as
    # a constant-key broadcast HASH join, not crossJoin: same rows,
    # but the plan stays inside the family's no-BNLJ invariant
    # (tests/test_plans.py semdedup shapes)
    grouped = (
        cent_df.withColumn("_k", F.lit(1))
        .join(F.broadcast(pivots.withColumn("_k", F.lit(1))), "_k")
        .select(
            "cell",
            "c",
            "cn",
            "g",
            (F.col("sgn") - 2 * _int_dot(F.col("c"), F.col("sg"))).alias(
                "_rel"
            ),
            (F.col("cn") + F.col("sgn")
             - 2 * _int_dot(F.col("c"), F.col("sg"))).alias("_d2"),
        )
        .groupBy("cell")
        .agg(
            F.min_by(
                F.struct("g", "c", "cn", "_d2"), F.struct("_rel", "g")
            ).alias("m")
        )
        .select("cell", "m.g", "m.c", "m.cn", F.col("m._d2").alias("_d2"))
    )
    radii = grouped.groupBy("g").agg(
        F.max(F.sqrt(F.col("_d2").cast("double"))).alias("rg")
    )
    # ONE row: the whole coarse level as an array of (g, sg, sgn, rg)
    coarse_row = (
        pivots.join(radii, "g")
        .agg(F.collect_list(F.struct("g", "sg", "sgn", "rg")).alias("gs"))
    )

    dg = lambda gcol: F.sqrt(  # noqa: E731
        (F.col("xn") + gcol["sgn"]
         - 2 * _int_dot(F.col("vi"), gcol["sg"])).cast("double")
    )
    cand = (
        v.withColumn("_k", F.lit(1))
        .join(F.broadcast(coarse_row.withColumn("_k", F.lit(1))), "_k")
        .withColumn(
            "_ds",
            F.transform(
                "gs",
                lambda gc: F.struct(
                    gc["g"].alias("g"),
                    dg(gc).alias("d"),
                    gc["rg"].alias("rg"),
                ),
            ),
        )
        .withColumn(
            "_ub",
            F.array_min(
                F.transform("_ds", lambda d: d["d"] + d["rg"])
            ),
        )
        .select(
            "vec_id",
            "vi",
            F.explode(
                F.filter(
                    "_ds",
                    lambda d: d["d"] - d["rg"]
                    <= F.col("_ub") + F.lit(_HIER_EPS),
                )
            ).alias("_d"),
        )
        .select("vec_id", "vi", F.col("_d.g").alias("g"))
    )
    # surviving groups only: candidates meet centroids in a g-keyed
    # COGROUP (two hash exchanges on g, never an O(C) broadcast — the
    # flat crossJoin's scale ceiling); scoring happens in hier_assign's
    # per-group GEMM kernel
    return cand, grouped


def ivf_cells_capped(n: int, occupancy: int = 128) -> int:
    """C = ⌈N/occupancy⌉ (floored at the sf0.01 value): cells ∝ N.

    The √-scaling of :func:`ivf_cells_for` balances exact assignment
    (N·C) against within-cell pair work (N²/C) at N^1.5 — the r08
    pipeline ladder measured that term at 72% of the sf100 wall and
    growing. Capping cell OCCUPANCY instead makes the dominance stage
    N·occ = linear; the price is that exact assignment at C ∝ N is
    N²/occ — unpayable — so this operating point pairs with
    :func:`greedy_assign` (per-vector work ~2√C, deterministic,
    approximate), which is what production IVF systems run. SemDeDup's
    cells are themselves a locality heuristic (Abbas et al. 2023 use
    plain k-means assignment with a fixed budget), so the greedy
    descent changes WHICH near-duplicates meet in a cell, not the
    operator's contract; the certified catalog entry keeps the exact
    path at its pinned C=16."""
    return max(_IVF_CELLS, -(-n // occupancy))


# Per-level pivot fan-in budget for the greedy descent: depth d is the
# smallest d ≥ 2 with C^(1/d) ≤ this, so per-vector probe work stays
# ~d·_DESCENT_FANIN dots no matter how large C grows. 256 keeps the
# certified ladder at two levels (C ≤ 65 536 — sf300's C = 46 875 — so
# every cross-round comparison point is unchanged) and flips to d = 3
# exactly where the r09 sf1000 probe measured the N·√C coarse term
# degrading per-vector cost 2.3× (SCALE.md "The sf1000 edge").
_DESCENT_FANIN = 256

# Largest pivot set the descent will collect to the driver / ride in a
# task closure: |P_{d-1}| = C^((d-1)/d) rows (2 916 at sf1000's
# C = 156 250 with d = 3 — ~1.5 MB). Past the cap the descent does NOT
# fail: levels above it become DISTRIBUTED routed tables
# (:func:`_routed_greedy_assign` — one salted cogroup per routed
# level), identical assignments by construction. The cap only decides
# WHERE a level runs: closure mapInPandas below it, cogroup equi-join
# above it.
_DESCENT_MAX_PIVOT_ROWS = 262_144


def _fanin_sizes(n_cells: int) -> list[int]:
    """The pure fan-in ladder n_i = ⌈C^(i/d)⌉, d the smallest depth
    ≥ 2 whose per-level fan-in C^(1/d) fits ``_DESCENT_FANIN`` — no
    closure-budget back-off (the routed variant doesn't need one:
    oversized levels run distributed instead of shrinking d)."""
    d = 2
    while d < 6 and n_cells ** (1.0 / d) > _DESCENT_FANIN:
        d += 1
    # −1e-9 absorbs float-pow fuzz (27^(1/3) = 3.0000000000000004)
    return [
        max(2, min(n_cells, math.ceil(n_cells ** (i / d) - 1e-9)))
        for i in range(1, d)
    ]


def _descent_level_sizes(n_cells: int) -> list[int]:
    """Pivot-level sizes [n_1, …, n_{d-1}] for the d-level descent:
    the fan-in ladder of :func:`_fanin_sizes`, backed off (deepest
    first) while the DEEPEST level C^((d-1)/d) would blow the closure
    budget: fan-in is a preference, the closure cap is a hard bound,
    and a d−1 tree trades a wider per-level scan for a closure that
    ships (C = 8×10⁷ — a 100 TB corpus at occupancy 128 — lands on
    d = 3: fan-in ~431, deepest level ~187k rows ≈ 96 MB broadcast).
    At C = 16 (the certified floor) this is [4] — the original
    two-level G = ⌈√C⌉. When even d = 2's √C exceeds the cap
    (C > ~6.9×10¹⁰ cells), :func:`greedy_assign` dispatches to the
    distributed-routing variant instead of using this back-off."""
    sizes = _fanin_sizes(n_cells)
    d = len(sizes) + 1
    while d > 2 and n_cells ** ((d - 1) / d) > _DESCENT_MAX_PIVOT_ROWS:
        d -= 1
    return [
        max(2, min(n_cells, math.ceil(n_cells ** (i / d) - 1e-9)))
        for i in range(1, d)
    ]


def _build_closure_levels(pivot_rows, sizes):
    """(levels, children) for the in-closure descent levels.
    levels[i] = (cells, coord-matrix, norms), cell-ASCENDING so that
    first-min argmin = lowest pivot id; children[i][j] = indices into
    level i+1 of the members routed under level-i pivot j (ascending,
    therefore cell-ascending). Level-(i+1) members are routed by the
    SAME hierarchical descent every other frame uses (descend through
    levels 0..i), not a flat global argmin over level i — for d ≤ 3
    (every certified ladder: one preceding level) the two rules are
    identical, and for deeper ladders the hierarchical rule is what
    the distributed-routing variant can reproduce exactly, keeping
    closure and routed assignments bit-equal at any depth. Driver
    numpy at ≤ C^((2d-3)/d) dots, trivial at any sandbox C."""
    import numpy as np

    levels = []
    for n_i in sizes:
        rows_i = sorted(pivot_rows[: min(n_i, len(pivot_rows))],
                        key=lambda r: r["cell"])
        levels.append(
            (
                np.array([r["cell"] for r in rows_i], dtype=np.int64),
                np.stack([np.asarray(r["c"], dtype=np.int64) for r in rows_i]),
                np.array([r["cn"] for r in rows_i], dtype=np.int64),
            )
        )
    children = []
    for i in range(len(levels) - 1):
        pc = levels[i][0]
        cm = levels[i + 1][1]
        leaf = _closure_descend(levels[: i + 1], children[:i], cm, 1)[:, 0]
        pos = {int(c): idx for idx, c in enumerate(pc)}
        parent = np.array([pos.get(int(c), -1) for c in leaf], dtype=np.int64)
        children.append(
            [np.flatnonzero(parent == j) for j in range(len(pc))]
        )
    return levels, children


def _closure_descend(levels, children, mat, p, margin=None):
    """(batch, ≤p) leaf-pivot CELL ids per row, best-first; ties at
    every level break to the lowest pivot id (stable argsort over
    cell-ascending candidates).

    ``margin`` (adaptive multiprobe, VERDICT r10 Next #6): with a
    float m, a candidate survives a level only when its TRUE squared
    distance ≤ (1+m) × the level's best — so ``p`` becomes a width
    CAP and the spend concentrates on boundary rows (the only place
    fixed-nprobe recall losses live) while interior rows keep paying
    nprobe-1 cost. None = fixed top-p (the certified behavior)."""
    import numpy as np

    n_levels = len(levels)
    xn = None
    if margin is not None:
        xm = mat.astype(np.int64, copy=False)
        xn = (xm * xm).sum(axis=1)

    def _take(scores, p_, xn_rows):
        """top-≤p_ column indices per row, -1-padded under margin."""
        if p_ == 1 and margin is None:
            return scores.argmin(axis=1)[:, None]
        order = np.argsort(scores, axis=1, kind="stable")[:, :p_]
        if margin is not None:
            d2 = np.take_along_axis(scores, order, axis=1) + xn_rows[:, None]
            keep = d2 <= (1.0 + margin) * d2[:, :1]
            order = np.where(keep, order, -1)
        return order

    _, m0, n0 = levels[0]
    rel = n0[None, :] - 2 * _exact_int_gemm(mat, m0)
    cur = _take(rel, p, xn)
    for i in range(1, n_levels):
        _, mi, ni = levels[i]
        kids = children[i - 1]
        # group rows by their probed-parent tuple: each group
        # scores ONE merged candidate set with ONE sub-GEMM
        keys, inv = np.unique(cur, axis=0, return_inverse=True)
        # width = min(p, level size), NOT the previous level's width:
        # a ladder whose level 0 is narrower than p (15 pivots, p=16)
        # can still merge ≥ p candidates at level 1 — allocating at
        # cur.shape[1] made the take assignment crash there (found by
        # the r12 routed margin/spill equality tests; unreachable for
        # every certified entry — the gate ladder is single-level)
        nxt = np.full(
            (len(mat), min(p, len(levels[i][0]))), -1, dtype=np.int64
        )
        width = 0
        for kidx in range(len(keys)):
            rows = np.flatnonzero(inv == kidx)
            cand = np.concatenate(
                [kids[par] for par in keys[kidx] if par >= 0]
            )
            if len(cand) == 0:  # pragma: no cover - defensive
                continue
            cand = np.sort(cand)  # index-asc = cell-asc tie-break
            sub = ni[cand][None, :] - 2 * _exact_int_gemm(
                mat[rows], mi[cand]
            )
            take = min(p, len(cand))
            width = max(width, take)
            if take == 1 and margin is None:
                nxt[rows, 0] = cand[sub.argmin(axis=1)]
            else:
                order = _take(
                    sub, take, xn[rows] if margin is not None else None
                )
                nxt[rows, :order.shape[1]] = np.where(
                    order >= 0, cand[np.maximum(order, 0)], -1
                )
        cur = nxt[:, : max(width, 1)]
    leaf_cells = levels[-1][0]
    out = np.where(cur >= 0, leaf_cells[np.maximum(cur, 0)], -1)
    return out


def _pivot_hash_col():
    """Portable deterministic pivot-sampling key: md5 of the cell id —
    the same cross-engine idiom as the MinHash oracles (dedup.py), so
    a DuckDB oracle can restate pivot selection verbatim
    (``md5('pv|' || CAST(cell AS VARCHAR))``). Replaces the r09 Spark
    ``hash()`` ordering, which had no DuckDB equivalent and forced the
    greedy catalog entry to a rows-only check (VERDICT r09 Next #3)."""
    return F.md5(F.concat(F.lit("pv|"), F.col("cell").cast("string")))


def greedy_assign(
    v: DataFrame,
    cent_df: DataFrame,
    n_cells: int,
    n_rows: int | None = None,
    nprobe: int = 1,
    probe_margin: float | None = None,
    group_spill: float | None = None,
    spill_cap: int = 8,
) -> DataFrame:
    """Deterministic d-level GREEDY nearest-centroid descent:
    vector → nearest of n_1 = ⌈C^(1/d)⌉ level-1 pivots → nearest
    level-2 pivot within that pivot's group → … → nearest centroid
    within the leaf pivot's group. Per-vector work is ~d·C^(1/d) dot
    products — linear-in-N total at cells ∝ N for any C, where the
    r09 two-level spelling's N·√C coarse term went N^1.5 (measured at
    sf1000: 41 µs/vec vs 18 at sf100; VERDICT r09 Next #1). All
    scoring is int64 GEMM; ties break to the lowest pivot id at every
    level and the lowest cell id at the leaf, so re-runs are
    bit-stable. Depth d comes from :func:`_descent_level_sizes`
    (d = 2 for every certified SF — the floor C = 16 never descends).

    ``nprobe`` (VERDICT r09 Next #4): keep the best ``nprobe`` pivots
    at every level instead of 1 — per-vector work scales ~nprobe·d·
    C^(1/d), recall approaches the exact argmin, and the final
    :func:`_score_groups` min_by already folds the multi-group
    winners exactly. Centroid GROUPING always routes nprobe=1 (the
    grouping is a partition of the cells); only the vector probe fans
    out.

    ``probe_margin`` (adaptive multiprobe, VERDICT r10 Next #6): with
    a float m, ``nprobe`` becomes a width CAP and a pivot is probed
    only when its true squared distance is within (1+m)× of the
    level's best. Fixed nprobe=16 pays 16 cell-groups for EVERY
    vector; the recall it buys lives only on boundary vectors, so the
    margin spends the extra groups exactly there — the uniform-
    geometry census reaches the same recall at a fraction of the
    wall (SCALE.md r11 census). None = fixed top-nprobe (certified).

    ``group_spill`` (cell-side multi-assignment, SOAR-style): a CELL
    joins every pivot group within (1+m)× of its best — so even an
    nprobe=1 vector sees neighboring groups' boundary cells. The
    complementary recall lever to the vector-side knobs: no
    per-vector fan-out, no fold; cost = duplicated boundary cells in
    the group tables (group sizes grow by the spill factor). The
    grouping stops being a partition, which is fine: a vector may
    score a spilled cell through two groups and min_by folds the
    duplicate (score, cell) rows exactly. Centroid-GROUPING for the
    Lloyd update is unaffected — spill only widens what the final
    argmin sees. Spill membership is width-capped at ``spill_cap``
    (default 8) groups per cell per level (ADVICE r11: the cap used
    to be silent) — for ladders whose per-level fan-in exceeds the
    cap a wide spill margin silently saturates at spill_cap groups;
    raise it explicitly for large-C censuses that assume uncapped
    spill. The DuckDB oracle restates the same cap.

    This is the pipeline's cells ∝ N operating point (pairs with
    :func:`ivf_cells_capped`). It is NOT exact nearest-centroid — a
    vector whose true nearest cell lives under a different pivot
    lands in a neighboring cell instead; the same trade every
    IVF/nprobe system makes, and multiprobe buys the gap back at a
    measured price (SCALE.md greedy-recall census).

    BALANCED pivots, not k-center: greedy routing sends each vector
    to ONE pivot's whole subtree, so pivot-region sizes are the work
    profile. k-center picks extreme points — after a Lloyd step
    collapses uniform-data centroids toward the mean, 44% of all
    centroids landed under one k-center pivot at sf100 (measured),
    turning the N·√C fine stage back into ~N·C. A deterministic
    hash-ordered sample is a uniform draw from the centroid
    distribution itself: its nearest-pivot regions carry ~equal
    measure on ANY geometry. Exactness is not at stake — pivots only
    steer the descent. The exact hier path keeps k-center (its
    triangle pruning wants compact covering radii, and its results
    are pivot-independent). The hash order also gives the levels a
    PREFIX property — P_1 ⊂ P_2 ⊂ … are prefixes of one ordering —
    so one bounded collect serves every level.

    Stage shapes: ≤ C^((d-1)/d) pivot rows ride the task closure
    (KB/MB — capped loudly at ``_DESCENT_MAX_PIVOT_ROWS``); centroid
    grouping is one mapInPandas over the C-row centroid table; the
    fine stage is the same salted cogroup + min_by as the exact path
    (:func:`_score_groups`). No O(C) broadcast, no window sort."""
    import numpy as np
    import pandas as pd

    sizes = _descent_level_sizes(n_cells)
    if sizes[-1] > _DESCENT_MAX_PIVOT_ROWS:
        # C > cap² (~6.9×10¹⁰ cells): no closure-sized ladder exists.
        # Route the oversized levels as distributed tables instead of
        # raising (VERDICT r10 Next #5) — same descent, same victims.
        # margin/spill compose with the routing since r12 (VERDICT r11
        # Next #3): the routed kernels carry true norms, so the same
        # (1+m)× filter runs after each level's cross-group fold.
        return _routed_greedy_assign(
            v, cent_df, n_cells, n_rows, nprobe,
            probe_margin=probe_margin, group_spill=group_spill,
            spill_cap=spill_cap,
        )
    pivot_rows = (
        cent_df.orderBy(_pivot_hash_col(), "cell")
        .limit(sizes[-1])
        .select("cell", "c", "cn")
        .collect()
    )
    spark = v.sparkSession
    if not pivot_rows:  # empty centroids: empty assignment
        return spark.createDataFrame([], "vec_id long, cell long")

    levels, children = _build_closure_levels(pivot_rows, sizes)

    def _descend(mat: "np.ndarray", p: int, m=None) -> "np.ndarray":
        return _closure_descend(levels, children, mat, p, m)

    def group_cents(batches):
        cap = spill_cap if group_spill is not None else 1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack(pdf["c"].to_numpy()).astype(np.int64, copy=False)
            gs = _descend(cm, cap, group_spill)
            reps = (gs >= 0).sum(axis=1)
            idx = np.repeat(np.arange(len(pdf)), reps)
            yield pd.DataFrame(
                {
                    "g": gs[gs >= 0],
                    "cell": pdf["cell"].to_numpy(dtype=np.int64)[idx],
                    "c": pdf["c"].to_numpy()[idx],
                    "cn": pdf["cn"].to_numpy(dtype=np.int64)[idx],
                }
            )

    def probe_vecs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.stack(pdf["vi"].to_numpy()).astype(np.int64, copy=False)
            gs = _descend(vm, nprobe, probe_margin)
            reps = (gs >= 0).sum(axis=1)
            idx = np.repeat(np.arange(len(pdf)), reps)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64)[idx],
                    "vi": pdf["vi"].to_numpy()[idx],
                    "g": gs[gs >= 0],
                }
            )

    cent_side = cent_df.select("cell", "c", "cn").mapInPandas(
        group_cents, "g long, cell long, c array<long>, cn long"
    )
    cand = v.select("vec_id", "vi").mapInPandas(
        probe_vecs, "vec_id long, vi array<long>, g long"
    )
    return _score_groups(cand, cent_side, _salt_count(v, n_rows))


def _route_level(
    left: DataFrame, pivots_ann: DataFrame, p: int, salts: int,
    margin: float | None = None,
) -> DataFrame:
    """One DISTRIBUTED descent level: ``left`` (id, vi, n, g) meets
    the level's parent-annotated pivot table ``pivots_ann``
    (g, cell, c, cn) in a salted cogroup on g — the equi-join spelling
    of what :func:`_closure_descend` does with a task-closure ladder —
    then a cross-group fold keeps each id's global best ``p`` pivots
    by (score, cell): per-group top-p retains every member of the
    union's top-p because the groups partition the candidates, and
    the (score, cell) struct sort reproduces the closure path's
    stable lowest-cell tie-break bit-for-bit. Returns the same
    (id, vi, n, g) shape with g = the new parent pivot's cell id.

    ``margin`` (VERDICT r11 Next #3): the (1+m)× true-distance filter
    the closure kernel applies inside ``_take``, re-spelled AFTER the
    cross-group fold — the fold's sorted top-p is the same merged
    candidate set the closure level sees, its head is the same global
    best (lowest-cell ties included), and d² = n + score is the same
    exact sub-2⁵³ BIGINT, so long→double + one IEEE multiply round
    identically on both paths. Requires ``left.n`` to be the TRUE
    ‖row‖² (the margin-blind probe passes n = 0, which only shifts
    scores uniformly and never reaches a filter)."""
    import numpy as np
    import pandas as pd

    def kernel(pdf_v: pd.DataFrame, pdf_c: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id": pd.Series([], dtype="int64"),
                "vi": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="int64"),
                "g": pd.Series([], dtype="int64"),
            }
        )
        if len(pdf_v) == 0 or len(pdf_c) == 0:
            return empty
        pdf_c = pdf_c.sort_values("cell")  # first-min = lowest cell id
        vm = np.stack(pdf_v["vi"].to_numpy()).astype(np.int64, copy=False)
        cm = np.stack(pdf_c["c"].to_numpy()).astype(np.int64, copy=False)
        cn = pdf_c["cn"].to_numpy(dtype=np.int64)
        cells = pdf_c["cell"].to_numpy(dtype=np.int64)
        scores = cn[None, :] - 2 * _exact_int_gemm(vm, cm)
        take = min(p, len(cells))
        if take == 1:
            j = scores.argmin(axis=1)[:, None]
        else:
            j = np.argsort(scores, axis=1, kind="stable")[:, :take]
        r = np.repeat(np.arange(len(vm)), j.shape[1])
        jf = j.ravel()
        return pd.DataFrame(
            {
                "id": pdf_v["id"].to_numpy(dtype=np.int64)[r],
                "vi": pdf_v["vi"].to_numpy()[r],
                "n": pdf_v["n"].to_numpy(dtype=np.int64)[r],
                "score": scores[r, jf],
                "g": cells[jf],
            }
        )

    schema = "id long, vi array<long>, n long, score long, g long"
    if salts > 1:
        lft = left.withColumn("s", F.pmod(F.hash("id"), F.lit(salts)))
        rgt = pivots_ann.withColumn(
            "s", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
        )
        scored = (
            lft.groupby("g", "s")
            .cogroup(rgt.groupby("g", "s"))
            .applyInPandas(kernel, schema)
        )
    else:
        scored = (
            left.groupby("g")
            .cogroup(pivots_ann.groupby("g"))
            .applyInPandas(kernel, schema)
        )
    if p == 1:
        # one row per (id, prior-parent); global best = min_by fold
        return (
            scored.groupBy("id")
            .agg(
                F.min_by(
                    F.struct("vi", "n", "g"), F.struct("score", "g")
                ).alias("m")
            )
            .select("id", "m.vi", "m.n", "m.g")
        )
    agged = scored.groupBy("id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("score", "g", "vi", "n"))
            ),
            1,
            p,
        ).alias("ms")
    )
    if margin is not None:
        best = F.element_at(F.col("ms"), 1)
        thr = F.lit(1.0 + margin) * (
            (best["score"] + best["n"]).cast("double")
        )
        agged = agged.withColumn(
            "ms",
            F.filter(
                "ms",
                lambda x: (x["score"] + x["n"]).cast("double") <= thr,
            ),
        )
    return (
        agged.select("id", F.explode("ms").alias("m"))
        .select("id", "m.vi", "m.n", "m.g")
    )


def _routed_greedy_assign(
    v: DataFrame,
    cent_df: DataFrame,
    n_cells: int,
    n_rows: int | None = None,
    nprobe: int = 1,
    probe_margin: float | None = None,
    group_spill: float | None = None,
    spill_cap: int = 8,
) -> DataFrame:
    """:func:`greedy_assign` for C past the closure budget: the SAME
    d-level greedy descent, with pivot levels larger than
    ``_DESCENT_MAX_PIVOT_ROWS`` routed as DISTRIBUTED tables — each
    oversized level is an equi-join (salted cogroup on the parent
    pivot id) against that level's hash-prefix pivot table, instead of
    a task-closure scan (VERDICT r10 Next #5).

    Level sizes come from the pure fan-in ladder (no closure
    back-off): the closure prefix (levels that fit the cap) rides one
    bounded collect exactly as in :func:`greedy_assign`; every deeper
    level P_i is selected distributedly (TopK on the same md5 pivot
    hash — the levels stay PREFIXES of one ordering), annotated with
    its own parent at level i−1 by the same routing machinery, and
    probed via :func:`_route_level`. Assignments are identical to the
    closure path by construction — same pivot sets, same int64
    scores, same (score, lowest-cell) tie-breaks — which the
    cap-monkeypatched equality test pins. Since r12 the recall knobs
    compose here too (VERDICT r11 Next #3): ``probe_margin`` filters
    the vector probe after each level's cross-group fold (the fold's
    head is the level's global best, so the (1+m)× compare sees the
    same exact BIGINT d² the closure kernel does), and ``group_spill``
    runs the cell stream at width ``spill_cap`` with the same filter —
    equality vs the closure path at every knob point is pinned by the
    same monkeypatched tests.

    Scale shape: per oversized level, one TopK selection + one salted
    cogroup whose per-task work is ~fan-in GEMM dots per row — no
    O(C) broadcast, no BroadcastNestedLoopJoin (plan-test-pinned), no
    driver state beyond the closure prefix. At C = 10¹² (beyond any
    stated corpus) that is d = 6, two routed levels, and the deepest
    routed table is a partitioned (g, cell, c, cn) frame any executor
    count can shard."""
    import numpy as np
    import pandas as pd

    sizes = _fanin_sizes(n_cells)
    cap = _DESCENT_MAX_PIVOT_ROWS
    k = 0
    while k < len(sizes) and sizes[k] <= cap:
        k += 1
    closure_sizes, dist_sizes = sizes[:k], sizes[k:]
    spark = v.sparkSession
    salts = _salt_count(v, n_rows)

    def level_salts(i: int) -> int:
        """Per-level salt count: a salt replicates the ENTIRE level
        table (oversized by definition here), so only salt where the
        left side actually concentrates — i.e. when the previous
        level has few parents. Deeper levels have ~level-size groups
        and per-group left rows ≈ N·p/parents, which is already
        task-sized; replicating a 10⁸-row level ×512 there would cost
        more than the skew it prevents."""
        if n_rows is None:
            return 1
        parents = (
            closure_sizes[-1] if (i == 0 and closure_sizes)
            else (1 if i == 0 else dist_sizes[i - 1])
        )
        per_group = max(1, (n_rows * max(1, nprobe)) // max(1, parents))
        return max(1, min(salts, -(-per_group // _SALT_TARGET_ROWS)))

    levels = children = None
    if closure_sizes:
        pivot_rows = (
            cent_df.orderBy(_pivot_hash_col(), "cell")
            .limit(closure_sizes[-1])
            .select("cell", "c", "cn")
            .collect()
        )
        if not pivot_rows:  # empty centroids: empty assignment
            return spark.createDataFrame([], "vec_id long, cell long")
        levels, children = _build_closure_levels(pivot_rows, closure_sizes)
    elif cent_df.limit(1).count() == 0:
        return spark.createDataFrame([], "vec_id long, cell long")

    def closure_route(
        df: DataFrame, id_col: str, coord_col: str, norm_col: str | None,
        p: int, margin: float | None = None,
    ) -> DataFrame:
        """(id, vi, n, g) rows — one per probed closure-leaf parent
        (g = −1 single global group when no level fits the closure).
        With ``margin``, n must be the TRUE ‖row‖² — the routed
        levels' filter needs it — so a norm-less stream derives it
        from the coordinates (one Column dot, no extra pass)."""
        if norm_col:
            n_expr = F.col(norm_col).cast("long")
        elif margin is not None:
            n_expr = _int_dot(F.col(coord_col), F.col(coord_col))
        else:
            n_expr = F.lit(0).cast("long")
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(coord_col).alias("vi"),
            n_expr.alias("n"),
        )
        if not closure_sizes:
            return base.withColumn("g", F.lit(-1).cast("long"))

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf["vi"].to_numpy()).astype(np.int64, copy=False)
                gs = _closure_descend(levels, children, m, p, margin)
                reps = (gs >= 0).sum(axis=1)
                idx = np.repeat(np.arange(len(pdf)), reps)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy(dtype=np.int64)[idx],
                        "vi": pdf["vi"].to_numpy()[idx],
                        "n": pdf["n"].to_numpy(dtype=np.int64)[idx],
                        "g": gs[gs >= 0],
                    }
                )

        return base.mapInPandas(gen, "id long, vi array<long>, n long, g long")

    # parent-annotated pivot table per oversized level: P_i routed
    # through the closure prefix and every previous oversized level
    # with p = 1 (the grouping is a partition — only the probe fans out)
    anns: list[DataFrame] = []
    for i, m_i in enumerate(dist_sizes):
        P = (
            cent_df.orderBy(_pivot_hash_col(), "cell")
            .limit(m_i)
            .select("cell", "c", "cn")
        )
        st = closure_route(P, "cell", "c", "cn", 1)
        for j in range(i):
            st = _route_level(st, anns[j], 1, level_salts(j))
        # each annotated level feeds ≥3 consumers (the pivot chain,
        # the centroid grouping, the vector probe) — materialize once
        # so the TopK selection + routing isn't re-derived per consumer
        anns.append(
            st.select(
                "g",
                F.col("id").alias("cell"),
                F.col("vi").alias("c"),
                F.col("n").alias("cn"),
            ).localCheckpoint(eager=True)
        )

    # centroid grouping (p = 1, or the spill fan-out) and the vector
    # probe (p = nprobe, margin-filtered) through the same ladder
    cell_p = spill_cap if group_spill is not None else 1
    cent_state = closure_route(cent_df, "cell", "c", "cn", cell_p, group_spill)
    for j, ann in enumerate(anns):
        cent_state = _route_level(
            cent_state, ann, cell_p, level_salts(j), group_spill
        )
    cent_side = cent_state.select(
        "g",
        F.col("id").alias("cell"),
        F.col("vi").alias("c"),
        F.col("n").alias("cn"),
    )
    cand = closure_route(v, "vec_id", "vi", None, nprobe, probe_margin)
    for j, ann in enumerate(anns):
        cand = _route_level(cand, ann, nprobe, level_salts(j), probe_margin)
    cand = cand.select(F.col("id").alias("vec_id"), "vi", "g")
    return _score_groups(cand, cent_side, salts)


# The gate-SF descent is d = 2 with G = ⌈√16⌉ = 4 pivots (the floor
# C = 16 never descends deeper); the oracle literal comes from the
# same function the runtime uses, so the two can never drift.
_GREEDY_GATE_G = _descent_level_sizes(_IVF_CELLS)[-1]


def _greedy_assign_sql(
    src: str, out: str, g_n: int, nprobe: int = 1,
    margin: float | None = None, spill: float | None = None,
    spill_cap: int = 8,
) -> str:
    """DuckDB restatement of one :func:`greedy_assign` round at the
    gate depth (d = 2): ``src`` is a CTE named (cell, c, cn); emits
    CTEs ``{out}piv`` (the md5-hash-sampled pivots), ``{out}cg``
    (cells grouped under their nearest pivot, ties to the lowest
    pivot id), ``{out}vg`` (each vector's best ``nprobe`` pivots) and
    ``{out}`` (vec_id, cell: the nearest cell across the probed
    groups, ties to the lowest cell id) — exactly the descent +
    cogroup-argmin + min_by fold the Spark kernels compute in int64.
    The probed pivot groups partition the cells, so the final
    row_number argmin sees each candidate cell once at any nprobe.

    ``margin``: the adaptive-multiprobe filter — a pivot survives
    only when its TRUE squared distance (exact BIGINT: ‖x‖² + rel) is
    ≤ (1+margin) × the vector's best. The single double multiply of
    an exact sub-2⁵³ integer is identically rounded on both engines,
    so the filter cannot drift cross-engine.

    ``spill``: the cell-side multi-assignment knob (group_spill) — a
    CELL joins every pivot group within (1+spill)× of its best true
    squared distance (exact BIGINT: ‖cell‖² + rel), width-capped at
    ``spill_cap`` (the runtime kernel's cap; can't bind at the gate's
    4 pivots). The grouping stops being a partition, so the final
    argmin may see a spilled cell through several groups — the tied
    (score, cell) rows project identically, so the rk = 1 pick stays
    deterministic, mirroring the Spark min_by fold of duplicates."""
    if margin is None:
        vg = f"""
    {out}vg AS (
      SELECT vec_id, g FROM (
        SELECT x.vec_id, p.g,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY p.sgn - 2 * CAST(list_dot_product(x.vi, p.sg)
                                           AS BIGINT),
                          p.g) AS rk
        FROM v x CROSS JOIN {out}piv p) t WHERE rk <= {nprobe}
    ),"""
    else:
        vg = f"""
    {out}vg AS (
      SELECT vec_id, g FROM (
        SELECT vec_id, g, d2,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY rel, g) AS rk,
               min(d2) OVER (PARTITION BY vec_id) AS best
        FROM (
          SELECT x.vec_id, p.g,
                 p.sgn - 2 * CAST(list_dot_product(x.vi, p.sg)
                                  AS BIGINT) AS rel,
                 CAST(list_dot_product(x.vi, x.vi) AS BIGINT) + p.sgn
                   - 2 * CAST(list_dot_product(x.vi, p.sg)
                              AS BIGINT) AS d2
          FROM v x CROSS JOIN {out}piv p) s) t
      WHERE rk <= {nprobe} AND d2 <= (1.0 + {margin}) * best
    ),"""
    if spill is None:
        cg = f"""
    {out}cg AS (
      SELECT cell, c, cn, g FROM (
        SELECT s.cell, s.c, s.cn, p.g,
               row_number() OVER (
                 PARTITION BY s.cell
                 ORDER BY p.sgn - 2 * CAST(list_dot_product(s.c, p.sg)
                                           AS BIGINT),
                          p.g) AS rk
        FROM {src} s CROSS JOIN {out}piv p) t WHERE rk = 1
    ),"""
    else:
        cg = f"""
    {out}cg AS (
      SELECT cell, c, cn, g FROM (
        SELECT cell, c, cn, g, d2,
               row_number() OVER (
                 PARTITION BY cell ORDER BY rel, g) AS rk,
               min(d2) OVER (PARTITION BY cell) AS best
        FROM (
          SELECT s.cell, s.c, s.cn, p.g,
                 p.sgn - 2 * CAST(list_dot_product(s.c, p.sg)
                                  AS BIGINT) AS rel,
                 s.cn + p.sgn - 2 * CAST(list_dot_product(s.c, p.sg)
                                         AS BIGINT) AS d2
          FROM {src} s CROSS JOIN {out}piv p) s0) t
      WHERE rk <= {spill_cap} AND d2 <= (1.0 + {spill}) * best
    ),"""
    return f"""
    {out}piv AS (
      SELECT cell AS g, c AS sg, cn AS sgn FROM {src}
      ORDER BY md5('pv|' || CAST(cell AS VARCHAR)), cell LIMIT {g_n}
    ),{cg}{vg}
    {out} AS (
      SELECT vec_id, cell FROM (
        SELECT x.vec_id, s.cell,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY s.cn - 2 * CAST(list_dot_product(x.vi, s.c)
                                          AS BIGINT),
                          s.cell) AS rk
        FROM v x
        JOIN {out}vg ON {out}vg.vec_id = x.vec_id
        JOIN {out}cg s ON s.g = {out}vg.g) t WHERE rk = 1
    )"""


_MARGIN_GATE = 0.1  # certified adaptive-margin literal
_SPILL_GATE = 0.3  # certified group-spill literal (SCALE.md census point)


def _greedy_entry_oracle(
    nprobe: int = 1, margin: float | None = None, spill: float | None = None
) -> str:
    """The shared DuckDB skeleton of every greedy-SemDeDup catalog
    entry (seed → descend → exact integer Lloyd → re-descend → per-
    cell dominance), parameterized on the descent knobs. All five
    entries' oracles are this helper's output at their knob points
    (r12: the r09–r11 literals were replaced by calls the moment
    byte-equality was pinned); the certified text at each point is
    md5-pinned in tests, so an accidental edit here cannot silently
    rewrite a certified oracle — changing this function is a
    deliberate act that re-queues every greedy entry.

    Why the skeleton is oracle-able at all (VERDICT r09 Next #3):
    pivot sampling is the portable md5 hash (the _minhash_cte idiom),
    so DuckDB restates the ENTIRE greedy path — pivot choice, gate-
    depth descent with lowest-pivot/lowest-cell ties, exact integer
    Lloyd update, re-descent, per-cell dominance. Every score is
    BIGINT on both engines; the occupancy cap (8×128 = 1024) cannot
    trigger at the gate SF (500 vectors over ≥16 cells), so the
    capped key ≡ the quantizer cell and the oracle omits the split
    arm — the same never-fires argument the exact twin's oracle
    makes for its assignment spelling."""
    a0 = _greedy_assign_sql(
        "seeds", "a0", _GREEDY_GATE_G, nprobe=nprobe, margin=margin,
        spill=spill,
    )
    a1 = _greedy_assign_sql(
        "cents2", "a1", _GREEDY_GATE_G, nprobe=nprobe, margin=margin,
        spill=spill,
    )
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {_IVF_FP}) AS BIGINT)) AS vi
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cell, vi AS c,
             CAST(list_dot_product(vi, vi) AS BIGINT) AS cn
      FROM v ORDER BY vec_id LIMIT {_IVF_CELLS}
    ),
    {a0},
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
    {a1},
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
    """


def _load_greedy_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        _as_double("embedding").alias("v"),
    ).withColumn(
        "vi",
        F.transform(
            F.col("v"), lambda x: F.floor(x * _IVF_FP).cast("long")
        ),
    )



@query(
    "dd_semdedup_ivf_greedy",
    # Full oracle (VERDICT r09 Next #3): the shared skeleton in
    # _greedy_entry_oracle restates the ENTIRE greedy path portably;
    # see its docstring for the oracle-ability argument.
    oracle=_greedy_entry_oracle(),
    survey_ref="beyond-reference: SemDeDup at the cells ∝ N operating "
    "point — greedy d-level descent + occupancy-capped dominance, "
    "the chained pipeline's production semantic stage (VERDICT r08 "
    "Next #2; oracle-checkable since r10 via md5 pivot sampling, "
    "VERDICT r09 Next #3)",
)
def dd_semdedup_ivf_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production (pipeline) spelling of semantic dedup: cells
    ∝ N via :func:`ivf_cells_capped`, assignment via
    :func:`greedy_assign`, dominance occupancy-capped at 8× the
    target. At gate SFs the corpus sits on the 16-cell floor and the
    cap never triggers, so this certifies exactly the code path
    tools/pipeline_e2e.py runs at sf300."""
    v = _load_greedy_vectors(spark, sf_dir)
    # the sizing RULE rides into the core as a callable: C is computed
    # from the core's checkpointed count, so the corpus is scanned once,
    # not once for ivf_cells_capped(v.count()) and again for the
    # checkpoint (optimization r13; same C, bit-identical result)
    return semdedup_ivf_core(
        v, ivf_cells_capped, assign="greedy", occupancy_cap=8 * 128
    )




@query(
    "dd_semdedup_ivf_greedy_np2",
    # The multiprobe middle point (VERDICT r09 Next #4), certified:
    # identical pipeline to dd_semdedup_ivf_greedy but the descent
    # keeps the best 2 pivots per level (rk <= 2 in the vg CTEs).
    # Probed groups partition the cells, so the final argmin sees
    # each candidate once; everything else is the greedy oracle.
    oracle=_greedy_entry_oracle(nprobe=2),
    survey_ref="beyond-reference: multiprobe greedy SemDeDup (nprobe=2 "
    "per descent level) — the recall middle point between the nprobe=1 "
    "production default and the exact argmin (VERDICT r09 Next #4)",
)
def dd_semdedup_ivf_greedy_np2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd_semdedup_ivf_greedy at nprobe=2: the descent scores the two
    best pivots per level (~2× probe work, still ≪ the exact path's C
    dots) and :func:`_score_groups`' min_by folds the multi-group
    winners exactly. The recall census (tools/greedy_recall_census.py)
    measures what the extra probe buys on uniform geometry."""
    v = _load_greedy_vectors(spark, sf_dir)
    return semdedup_ivf_core(  # callable C rule: one corpus scan (r13)
        v, ivf_cells_capped, assign="greedy", occupancy_cap=8 * 128, nprobe=2
    )




@query(
    "dd_semdedup_ivf_greedy_margin",
    # Adaptive multiprobe (VERDICT r10 Next #6), certified: identical
    # pipeline to dd_semdedup_ivf_greedy but a pivot is probed only
    # when its TRUE squared distance is within (1+0.1)x of the best
    # (width-capped at 16 >= the gate's 4 pivots). The margin compare
    # multiplies an exact sub-2^53 BIGINT by the same double literal
    # on both engines - one identically-rounded IEEE op - so the
    # filter cannot drift cross-engine.
    oracle=_greedy_entry_oracle(nprobe=16, margin=_MARGIN_GATE),
    survey_ref="beyond-reference: boundary-adaptive multiprobe greedy "
    "SemDeDup — a pivot is probed only within (1+m)× of the best true "
    "distance, so the multiprobe spend concentrates on boundary "
    "vectors (VERDICT r10 Next #6)",
)
def dd_semdedup_ivf_greedy_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd_semdedup_ivf_greedy with ``probe_margin=0.1`` (cap 16): the
    descent probes extra pivots only where the vector actually sits
    near a pivot boundary — interior vectors keep paying nprobe-1
    cost. The uniform-geometry recall census measures what the margin
    buys per wall-second (SCALE.md r11)."""
    v = _load_greedy_vectors(spark, sf_dir)
    return semdedup_ivf_core(  # callable C rule: one corpus scan (r13)
        v, ivf_cells_capped, assign="greedy", occupancy_cap=8 * 128,
        nprobe=16, probe_margin=_MARGIN_GATE,
    )




@query(
    "dd_semdedup_ivf_greedy_spill",
    # Cell-side spill (SOAR-style multi-assignment), certified
    # (VERDICT r11 Next #1): identical pipeline to
    # dd_semdedup_ivf_greedy but a CELL joins every pivot group
    # within (1+0.3)× of its best true squared distance (cap 8 ≥ the
    # gate's 4 pivots, so the cap cannot bind). The spill compare
    # multiplies an exact sub-2⁵³ BIGINT by the same double literal
    # on both engines — one identically-rounded IEEE op.
    oracle=_greedy_entry_oracle(spill=_SPILL_GATE),
    survey_ref="beyond-reference: cell-side spill greedy SemDeDup — "
    "boundary cells join every pivot group within (1+s)× of their "
    "best, so even an nprobe=1 vector sees neighboring groups' "
    "boundary cells (VERDICT r11 Next #1; the recall lever the "
    "production pipeline engages via --spill)",
)
def dd_semdedup_ivf_greedy_spill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd_semdedup_ivf_greedy with ``group_spill=0.3``: the cell-side
    lever of the m0.1+s0.3 census point (spill alone on the uniform
    floor: s0.2 = 0.723 victim-Jaccard at ~1× np1's wall, s0.4 =
    0.763 at 1.07× — nearly free because it adds GEMM columns, not
    per-vector fan-out; SCALE.md r11 census). Certifies the exact
    code path tools/pipeline_e2e.py engages with --spill 0.3."""
    v = _load_greedy_vectors(spark, sf_dir)
    return semdedup_ivf_core(  # callable C rule: one corpus scan (r13)
        v, ivf_cells_capped, assign="greedy", occupancy_cap=8 * 128,
        group_spill=_SPILL_GATE,
    )


@query(
    "dd_semdedup_ivf_greedy_ms",
    # THE headline recall configuration (m0.1 + s0.3 — the operating
    # point SCALE.md leads with: uniform-floor recall 0.882 at 1.75×
    # np1, clustered geometry bit-exact vs the exact assignment),
    # certified end-to-end (VERDICT r11 Next #1): vector-side margin
    # AND cell-side spill composed in one descent.
    oracle=_greedy_entry_oracle(
        nprobe=16, margin=_MARGIN_GATE, spill=_SPILL_GATE
    ),
    survey_ref="beyond-reference: the pipeline's headline recall "
    "operating point — adaptive vector margin (m=0.1, cap 16) + "
    "cell spill (s=0.3) composed; the spelling the sf1000 rung runs "
    "(VERDICT r11 Next #1)",
)
def dd_semdedup_ivf_greedy_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd_semdedup_ivf_greedy with BOTH recall knobs — probe_margin
    0.1 (cap 16) and group_spill 0.3 — the m0.1+s0.3 census point
    SCALE.md's banner number rides. Until r12 this exact spelling was
    pytest-pinned only; this entry gives it the same hash-green
    driver row as every other dedup spelling."""
    v = _load_greedy_vectors(spark, sf_dir)
    return semdedup_ivf_core(  # callable C rule: one corpus scan (r13)
        v, ivf_cells_capped, assign="greedy", occupancy_cap=8 * 128,
        nprobe=16, probe_margin=_MARGIN_GATE, group_spill=_SPILL_GATE,
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
      -- the C lowest ids PRESENT (== vec_id < C on dense ids; robust
      -- to the sparse survivor-id inputs the pipeline feeds)
      SELECT vec_id AS cell, vi AS si,
             CAST(list_dot_product(vi, vi) AS BIGINT) AS sn
      FROM v ORDER BY vec_id LIMIT {_IVF_CELLS}
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

    Plan: (1) seeds = the C lowest vec_ids PRESENT (C =
    ivf_cells_for(count), pinned at 16 for sf0.01 so the certified
    hash never moves); (2) assign every vector to its nearest seed
    via :func:`assign_cells` — flat GEMM for KB-scale centroid tables
    (this entry's C=16), else :func:`hier_assign`'s two-level probe
    broadcasting ⌈√C⌉ coarse pivots, exact by triangle-inequality
    pruning, argmin as a map-side-combinable min_by, never a window
    sort over N·C rows and never an O(C) broadcast (the r07 flat
    crossJoin's 100 TB ceiling, VERDICT r07 Missing #2); (3) exact
    integer centroid update (BIGINT dim sums are order-free;
    truncating div matches DuckDB //); (4) re-assign to the updated
    centroids the same way; (5) dd_semdedup's dominance anti-join
    within each cell. More Lloyd iterations loop stages 3-4 with the
    same plan; the float production fit is ivf_topk's pyspark.ml
    KMeans — this entry certifies the downstream plan with a
    quantizer both engines can compute bit-identically. The oracle
    keeps the SQL flat-argmin spelling: both assignment paths are
    exact, so the hashes must agree — and they certifiably do."""
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
    # sizing rule passed as a callable: the core computes C from its
    # checkpointed count — no separate pre-checkpoint count job (r13,
    # same as the greedy family; hash unchanged, C identical)
    return semdedup_ivf_core(v, ivf_cells_for)


# Sub-split id space: capped-cell ids are cell * 2^20 + sub, so cells
# up to 2^43 and splits up to 2^20 never collide in a long.
_SPLIT_BASE = 1 << 20


def _cap_cell_occupancy(b: DataFrame, cap: int) -> DataFrame:
    """Deterministically split any cell holding more than ``cap``
    vectors into ⌈occ/cap⌉ hash subcells (cell ids remapped to
    cell·2^20 + sub).

    Within-cell dominance work is occ² — unbounded when the quantizer
    concentrates (measured: greedy cells at sf10 average 128 but p99
    = 1143, max 1496; Σ occ² grows super-linearly with the corpus
    even at fixed average occupancy). The cap bounds the worst cell's
    GEMM at ~cap² and total dominance work at ~N·cap (hash subcells
    are even in expectation; the worst subcell exceeds cap only by
    the hash's O(√(cap·log k)) fluctuation) — the price is
    that near-dups split across subcells stop meeting, the same
    recall-for-boundedness trade every LSH band makes, and exactly
    the "budget-bounded cluster" production SemDeDup runs. Hash
    splitting is deterministic (re-runs bit-stable); cells at or
    under the cap keep their original ids and results."""
    occ = b.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    splits = occ.select(
        "cell",
        F.greatest(
            F.lit(1), F.ceil(F.col("_n") / F.lit(cap))
        ).cast("long").alias("_k"),
    )
    return (
        b.join(splits, "cell")  # C-row side: AQE broadcasts it
        .withColumn(
            "_dcell",
            F.when(F.col("_k") > 1,
                   F.col("cell") * _SPLIT_BASE
                   + F.pmod(F.hash("vec_id"), F.col("_k")))
            .otherwise(F.col("cell")),
        )
        .drop("_k")
    )


def _lloyd_centroids(
    v: DataFrame, a: DataFrame, n_rows: int | None = None
) -> DataFrame:
    """Exact integer Lloyd centroid update: (cell, c array<long>) with
    c[i] = sum(vi[i]) div count per cell.

    Spelling note (optimization r12): an alternative "dim per-element
    sum columns in one aggregate" spelling — first-principles fewer
    shuffled bytes (C·(dim+1) partials vs dim·N exploded rows) — was
    built and MEASURED SLOWER at both operating points: +0.4 s per ivf
    entry at sf0.1 (fixed plan/codegen price of 64 aggregate columns)
    and 2-3× the stage wall at sf30/600k vectors (31-40 s vs 12-17 s;
    identical victims), so it was reverted (guide §1.1: the "ideal"
    plan lost to the gotcha — wide multi-aggregate rows evaluate far
    worse than Spark's columnar explode+narrow-agg path). ``n_rows``
    is accepted for call-site stability and ignored."""
    del n_rows
    dims = (
        v.join(a, "vec_id")
        .select("cell", F.posexplode("vi").alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.expr("sum(x) div count(*)").alias("cd"))
    )
    return dims.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cd"))),
            lambda s: s["cd"],
        ).alias("c")
    )


def semdedup_ivf_core(
    v: DataFrame,
    n_cells: int | Callable[[int], int],
    tau: float = _IVF_TAU,
    assign: str = "exact",
    occupancy_cap: int | None = None,
    nprobe: int = 1,
    probe_margin: float | None = None,
    group_spill: float | None = None,
    spill_cap: int = 8,
) -> DataFrame:
    """The reusable trained-cell SemDeDup pipeline: seed → assign →
    exact integer Lloyd update → re-assign → per-cell GEMM dominance.
    ``v`` must carry (vec_id, v array<double>, vi array<long>);
    returns (vec_id, cell, keep, removed_by). The catalog entry wraps
    this on the test embeddings; the end-to-end pipeline probe
    (tools/pipeline_e2e.py) chains it between near-dup removal and
    shard packing on the full corpus.

    ``n_cells`` may be an int or a callable ``n_rows -> int`` (e.g.
    :func:`ivf_cells_capped` itself): the callable is evaluated on the
    core's own checkpointed count, so cells ∝ N callers don't pay a
    separate pre-checkpoint corpus scan just to size C.

    ``assign``: "exact" (the certified path — :func:`assign_cells`,
    true nearest-centroid at N·C worst-case work) or "greedy" (the
    cells ∝ N operating point — :func:`greedy_assign`, d-level
    descent, ~d·C^(1/d) work per vector, deterministic but
    approximate; pair with :func:`ivf_cells_capped`).

    ``nprobe`` (greedy only): probe the best ``nprobe`` pivots per
    descent level — the recall middle point between nprobe=1 and the
    exact argmin (VERDICT r09 Next #4). The certified catalog entry
    pins nprobe=1. ``probe_margin`` makes nprobe a width cap and
    probes only pivots within (1+m)× of the best true distance —
    boundary-adaptive recall at near-np1 average cost (see
    :func:`greedy_assign`).

    ``occupancy_cap``: when set, cells holding more vectors are hash
    sub-split before dominance (:func:`_cap_cell_occupancy`), bounding
    total pair work at N·cap regardless of quantizer skew. None (the
    certified default) leaves cells whole."""
    if assign not in ("exact", "greedy"):
        raise ValueError(f"assign must be 'exact' or 'greedy', got {assign!r}")
    if assign == "exact":
        assign_fn = assign_cells
    else:
        def assign_fn(v_, cent_, n_, n_rows=None):
            return greedy_assign(
                v_, cent_, n_, n_rows=n_rows, nprobe=nprobe,
                probe_margin=probe_margin, group_spill=group_spill,
                spill_cap=spill_cap,
            )
    # ‖x‖² once per vector: both hierarchical assignments' pruning
    # bounds need it, and it checkpoints with the rest of the frame
    v = v.withColumn("xn", _int_dot(F.col("vi"), F.col("vi")))
    v = v.localCheckpoint(eager=True)  # reused by 4 downstream stages
    n_rows = v.count()  # checkpointed: a metadata-cheap count
    if callable(n_cells):
        # cells ∝ N callers pass the sizing RULE, not a pre-computed
        # count: counting the un-checkpointed input first cost one full
        # extra corpus scan per run (optimization r13, guide §1.2 "don't
        # compute things you throw away") — the checkpointed count above
        # is the one N the whole pipeline needs.
        n_cells = n_cells(n_rows)

    # seeds = the C lowest vec_ids PRESENT (ADVICE r08: `vec_id <
    # n_cells` assumed dense 0..N-1 ids; the pipeline feeds SURVIVOR
    # ids, which are sparse — the old predicate silently under-seeded,
    # and with zero surviving low ids the whole stage no-opped).
    # Identical to `vec_id < n_cells` on dense ids, so the certified
    # sf0.01 hash is unchanged. Top-k by id, not a global sort; the
    # limit() routes ~C rows through one task, fine to C ~ 10⁶ — at
    # extreme C (100 TB, C ~ 10⁸) swap in a map-side hash filter
    # (where(pmod(hash(vec_id), N div C) == 0)): any C vectors are
    # valid seeds, only the certified entry pins WHICH.
    seeds = (
        v.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("vi").alias("c"),
            F.col("xn").alias("cn"),
        )
    )
    if n_rows < n_cells:
        import warnings

        warnings.warn(
            f"semdedup_ivf_core: corpus has {n_rows} vectors < "
            f"{n_cells} requested cells; seeding {n_rows} cells",
            stacklevel=2,
        )

    a0 = assign_fn(v, seeds, n_cells, n_rows=n_rows)

    cents = _lloyd_centroids(v, a0, n_rows=n_rows)
    cents = cents.withColumn("cn", _int_dot(F.col("c"), F.col("c")))
    # the updated centroids feed TWO hierarchical stages (grouping +
    # probe + argmin); pin them so the Lloyd lineage isn't re-run
    cents = cents.localCheckpoint(eager=True)

    a1 = assign_fn(v, cents, n_cells, n_rows=n_rows)

    from oroboro_dw_dbt_spark.dedup.semdedup import dominance_pairs

    b = v.join(a1, "vec_id").select("vec_id", "cell", "v")
    # dominance runs on the occupancy-capped key (_dcell); the
    # REPORTED cell stays the quantizer's (sub-split ids are an
    # internal bound, and they would overflow the int cell column)
    dom_col = "cell"
    if occupancy_cap is not None:
        b = _cap_cell_occupancy(b, occupancy_cap)
        dom_col = "_dcell"
    b = b.localCheckpoint(eager=True)
    dom = dominance_pairs(b, dom_col, tau)
    return b.join(dom, F.col("vec_id") == F.col("victim"), "left").select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.col("victim").isNull().cast("int").alias("keep"),
        "removed_by",
    )
