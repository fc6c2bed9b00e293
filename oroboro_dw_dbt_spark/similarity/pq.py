"""Product quantization with asymmetric distance computation (ADC).

The memory-side rung of the ANN ladder this repo builds (brute-force →
LSH buckets → IVF cells → int8 SQ → PQ): compress each vector into m
sub-codes (here 4 × 4-bit-ish codes instead of 64 floats) and score
candidates against a per-query distance LOOKUP TABLE instead of the
raw vectors — Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search" (TPAMI), the design behind FAISS's IVF-PQ.

Why it matters at 100 TB: the candidate side of an ANN scan carries
only (vec_id, m codes) — a ~16× memory/IO reduction — and the per-query
work is m table lookups + adds per candidate, no float dot products.
The distance table is (queries × m × k) rows — KB-sized — and is
BROADCAST to the candidate scan; the only shuffle is the final
per-query top-k, which batch-local pruning keeps at O(queries × k)
rows per partition (same shape as ss_matmul_topk).

Determinism contract (the repo-wide oracle discipline): vectors are
quantized to integers (scale 1000, round-half-away-from-zero — the
rounding both Spark and DuckDB implement for doubles), so every
distance is an exact BIGINT, argmin ties break to the lowest code id
via array_position's first-match semantics, and the whole pipeline is
bit-identical on any engine/partitioning. The codebook is the m
subvectors of the k lowest-vec_id rows — a deterministic stand-in for
k-means (production fits per-subspace k-means on a sample; the
assignment/ADC plan is IDENTICAL either way, which is what this
module certifies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT_SCALE = 1000  # fixed-point scale for vector components


def _quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q): components as scale-1000 BIGINTs."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * QUANT_SCALE).cast("bigint"),
        ).alias("q"),
    )


def fit_pq_codebook(
    emb: DataFrame, m: int = 4, k: int = 16, dim: int = 64
) -> list[list[list[int]]]:
    """codebook[j][c] = subspace-j centroid of seed row c (ints).

    Seeds are the k lowest vec_ids — bounded driver collect (k rows),
    the same guarded pattern as the IVF sampler in search.py.
    """
    sub = dim // m
    seeds = _quantized(emb).orderBy("vec_id").limit(k).collect()
    return [
        [list(row["q"][j * sub : (j + 1) * sub]) for row in seeds]
        for j in range(m)
    ]


def _l2sq(vec_slice: Column, centroid: list[int]) -> Column:
    """Exact integer squared-L2 between a subvector and a literal
    centroid."""
    lit = F.array(*[F.lit(int(c)).cast("bigint") for c in centroid])
    return F.aggregate(
        F.zip_with(vec_slice, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )


def pq_assign(
    emb: DataFrame, codebook: list[list[list[int]]], dim: int = 64
) -> DataFrame:
    """(vec_id, j, code): each vector's nearest centroid per subspace.

    Pure Column tree — the distance to every centroid folds into
    whole-stage codegen; argmin = array_position of the min, whose
    first-match semantics IS the tie-to-lowest-code rule.
    """
    m, k = len(codebook), len(codebook[0])
    sub = dim // m
    per_sub = []
    for j in range(m):
        sl = F.slice("q", j * sub + 1, sub)
        dists = F.array(*[_l2sq(sl, codebook[j][c]) for c in range(k)])
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        per_sub.append(F.struct(F.lit(j).alias("j"), code.alias("code")))
    return _quantized(emb).select(
        "vec_id", F.explode(F.array(*per_sub)).alias("s")
    ).select("vec_id", F.col("s.j").alias("j"), F.col("s.code").alias("code"))


def _distance_table(
    emb: DataFrame,
    query_ids: list[int],
    codebook: list[list[list[int]]],
    dim: int,
) -> DataFrame:
    """(query_id, j, c, d): every query's distance to every centroid —
    (|queries| × m × k) rows, KB-sized, built by the same Column
    machinery as the assignment, meant to be broadcast."""
    m, k_codes = len(codebook), len(codebook[0])
    sub = dim // m
    cells = [
        F.struct(
            F.lit(j).alias("j"),
            F.lit(c).alias("c"),
            _l2sq(F.slice("q", j * sub + 1, sub), codebook[j][c]).alias("d"),
        )
        for j in range(m)
        for c in range(k_codes)
    ]
    return (
        _quantized(emb)
        .filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"), F.explode(F.array(*cells)).alias("s")
        )
        .select("query_id", "s.j", "s.c", "s.d")
    )


def _adc_topk(pairs: DataFrame, k_neighbors: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_neighbors: int = 5,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k by PQ-ADC: codes for every candidate, a
    broadcast per-query distance table, lookup-sum, top-k.

    Returns (query_id, vec_id, adc_dist, rank) — adc_dist is the exact
    integer sum of per-subspace quantized distances.
    """
    codebook = fit_pq_codebook(emb, m=m, k=k_codes, dim=dim)
    codes = pq_assign(emb, codebook, dim=dim)
    dtable = _distance_table(emb, query_ids, codebook, dim)
    pairs = (
        codes.join(
            F.broadcast(dtable),
            (codes.j == dtable.j) & (codes.code == dtable.c),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("bigint").alias("adc_dist"))
    )
    return _adc_topk(pairs, k_neighbors)


def coarse_cells(
    emb: DataFrame, codebook: list[list[list[int]]], dim: int
) -> DataFrame:
    """(vec_id, cell): nearest FULL-vector seed centroid — the IVF
    coarse quantizer, same argmin/tiebreak contract as pq_assign but
    over the whole vector (m=1)."""
    k = len(codebook[0])
    full = [
        [x for j in range(len(codebook)) for x in codebook[j][c]]
        for c in range(k)
    ]
    dists = F.array(*[_l2sq(F.col("q"), full[c]) for c in range(k)])
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return _quantized(emb).select("vec_id", cell.alias("cell"))


def ivf_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_neighbors: int = 5,
    m: int = 4,
    k_codes: int = 16,
    dim: int = 64,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-PQ: the composed production ANN plan (FAISS's IndexIVFPQ).

    Candidates are restricted to each query's ``n_probe`` nearest
    coarse cells (an equi-join on cell id — corpus × n_probe/k of the
    data, never a full scan), then scored by PQ-ADC within the probed
    cells. Everything stays integer-exact: cell assignment and probe
    ranking use the same quantized full-vector L2 with the
    (dist, cell-id) composite tiebreak, so the result is reproducible
    bit-for-bit on any engine.

    At 100 TB: the corpus is written PARTITIONED BY cell (the inverted
    file); a probe touches n_probe/k of the files via partition
    pruning, reads only (vec_id, codes) — the 16×-compressed payload —
    and the distance tables ride in as one KB-scale broadcast.
    """
    codebook = fit_pq_codebook(emb, m=m, k=k_codes, dim=dim)
    cells = coarse_cells(emb, codebook, dim)
    codes = pq_assign(emb, codebook, dim=dim)
    dtable = _distance_table(emb, query_ids, codebook, dim)

    # probe list: each query's n_probe nearest cells by full-vector
    # distance, ranked by the dist*k + cell composite (ties -> lower id)
    k = k_codes
    full = [
        [x for j in range(len(codebook)) for x in codebook[j][c]]
        for c in range(k)
    ]
    probe_cells = [
        F.struct(
            F.lit(c).alias("cell"), _l2sq(F.col("q"), full[c]).alias("d")
        )
        for c in range(k)
    ]
    pw = Window.partitionBy("query_id").orderBy(
        (F.col("d") * k + F.col("cell")).asc()
    )
    probes = (
        _quantized(emb)
        .filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.array(*probe_cells)).alias("s"),
        )
        .select("query_id", "s.cell", "s.d")
        .withColumn("_rn", F.row_number().over(pw))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "cell")
    )
    candidates = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    dt = dtable.select(
        F.col("query_id").alias("_tq"),
        F.col("j").alias("_tj"),
        F.col("c").alias("_tc"),
        "d",
    )
    pairs = (
        candidates.join(codes, "vec_id")
        .join(
            F.broadcast(dt),
            (F.col("_tq") == F.col("query_id"))
            & (F.col("_tj") == F.col("j"))
            & (F.col("_tc") == F.col("code")),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("bigint").alias("adc_dist"))
    )
    return _adc_topk(pairs, k_neighbors)
