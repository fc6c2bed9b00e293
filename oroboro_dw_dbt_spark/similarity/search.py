"""Approximate-nearest-neighbor search over an embedding column.

Two paths, same surface (query vecs → top-k neighbors by cosine):

- **brute force** — the correctness baseline: queries × candidates with
  the dot product as a zip_with/aggregate Column tree. Fine when the
  query set is small (broadcast) and the corpus scan is one pass; the
  k-selection is a per-query window top-k (TakeOrdered shape, no global
  sort).
- **LSH-bucketed** — the scale path: random-hyperplane signatures
  (Charikar 2002 SimHash for angles). Each vector gets a `num_planes`-bit
  bucket; query and candidate must share the bucket to be compared, so
  the pairwise compare is an equi-join on the bucket id — O(collisions),
  and exactly the plan shape an IVF index produces with cells ≡ buckets.
  Recall loss is the standard LSH trade; `lsh_multiprobe_topk` claws
  most of it back by also probing every bucket at Hamming distance 1
  from the query's (Lv et al. 2007 multi-probe LSH) — still an
  equi-join, with (num_planes + 1)× the probe rows on the tiny query
  side only.

The hyperplane matrix is a deterministic Python-side constant
(sin-based, rounded to 6 decimals) embedded as literals in BOTH the
Spark plan and the SQL oracle — no engine-native RNG or libm calls whose
last-ulp behavior could diverge between JVM and C.

No UDFs in the codegen paths: dot products are zip_with + aggregate.
For wide vectors (≥512 dims) the element-wise Column tree loses to a
BLAS matmul over Arrow batches — that is :func:`matmul_topk`, the one
deliberate Pandas path here: a `mapInPandas` kernel that scores a whole
Arrow batch against all query vectors with one numpy matmul and emits
only its per-batch top-k partials (map-side combine for top-k), so the
shuffle carries ≤ batches × queries × k rows instead of the full
pairwise score matrix.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lsh_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: sin(p·131 + d·7 + 1)
    rounded to 6 decimals — identical constants on any engine."""
    return [
        [round(math.sin(p * 131 + d * 7 + 1), 6) for d in range(dim)]
        for p in range(num_planes)
    ]


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit p = sign(vec · plane_p)."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        dot = F.lit(0.0)
        # plane constants are literals — Catalyst folds them into codegen
        for d, w in enumerate(plane):
            if w != 0.0:
                dot = dot + vec[d] * F.lit(w)
        bucket = bucket + F.when(dot > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are a tiny broadcast side; candidates stream once. Ties
    break on vec_id so results are total-ordered (SURVEY §2.5 W4 lesson).
    """
    v = emb.select("vec_id", _as_double("embedding").alias("v"))
    q = v.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        F.broadcast(q)
        .join(v, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    return _topk(pairs, k)


def lsh_bucketed_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5, num_planes: int = 6, dim: int = 64
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within the bucket. The bucket equi-join is
    the whole trick — at 100 TB it shuffles on bucket id instead of
    comparing all pairs."""
    planes = lsh_planes(num_planes, dim)
    v = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "bucket", hyperplane_bucket(F.col("v"), planes)
    )
    q = v.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    pairs = (
        F.broadcast(q)
        .join(v, (F.col("qb") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    return _topk(pairs, k)


def lsh_multiprobe_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket AND every
    single-bit-flip neighbor bucket (Hamming-1), recovering neighbors
    that fell just across one hyperplane — the first recall knob a real
    ANN user turns. The probe fan-out multiplies only the broadcast
    query side by (num_planes + 1); the corpus is still touched once
    via the bucket equi-join. Candidate buckets are distinct, so no
    pair dedup is needed."""
    planes = lsh_planes(num_planes, dim)
    v = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "bucket", hyperplane_bucket(F.col("v"), planes)
    )
    q = v.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(2**p)) for p in range(num_planes)],
            )
        ).alias("probe"),
    )
    pairs = (
        F.broadcast(q)
        .join(v, (F.col("probe") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    return _topk(pairs, k)


def matmul_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    max_queries: int = 1024,
) -> DataFrame:
    """Exact top-k cosine neighbors via a BLAS matmul over Arrow batches
    — the wide-vector fast path (same surface and same results as
    :func:`brute_force_topk`).

    Per Arrow batch the `mapInPandas` kernel scores ALL query vectors at
    once with one `(batch × dim) @ (dim × n_queries)` float64 matmul,
    then keeps only the batch-local top-k per query (map-side combine
    for top-k: the shuffle carries ≤ batches × queries × k rows, not the
    full score matrix); a final window top-k merges partials. Every
    global winner is a batch-local winner under the same
    (cosine DESC, vec_id) comparator, so the pruning is lossless.

    Measured vs the zip_with/aggregate Column tree (sf0.1 corpus,
    local[32], 8 queries): 3.6 s → 0.95 s at 64 dims (3.8×) and
    8.1 s → 1.3 s at 1024 dims (6.2×) — the higher-order-function
    lambda is interpreted per element, so BLAS wins at every width and
    the gap grows with dim; see SCALE.md. Cosines are rounded to 6
    decimals like every other similarity entry, so the two paths agree
    exactly with the oracle (verified: identical result hash).

    The query matrix is collected driver-side (bounded by
    ``max_queries``, same guard as :func:`ivf_topk`) and shipped to
    executors inside the serialized kernel closure — KBs, the classic
    broadcast-a-small-matrix pattern.
    """
    import numpy as np
    import pandas as pd

    from oroboro_dw_dbt_spark.functions.rounding import np_round_half_up

    if len(query_ids) > max_queries:
        raise ValueError(
            f"matmul_topk collects query vectors onto the driver: got "
            f"{len(query_ids)} query_ids, max_queries={max_queries}"
        )
    v = emb.select("vec_id", _as_double("embedding").alias("v"))
    qrows = sorted(
        v.filter(F.col("vec_id").isin(query_ids)).collect(), key=lambda r: r.vec_id
    )
    if not qrows:
        # none of query_ids exist: a (0, dim) qmat would crash the kernel's
        # matmul/outer on executors; match brute_force_topk's empty frame
        return emb.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = np.array([r.v for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qnorm[qnorm == 0.0] = 1.0

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["v"].to_numpy())  # (batch, dim) float64
            norm = np.sqrt((mat * mat).sum(axis=1))
            norm[norm == 0.0] = 1.0
            # HALF_UP like F.round/DuckDB — np.round is banker's and flips
            # dyadic midpoints (and therefore can flip a pruned rank)
            cos = np_round_half_up((mat @ qmat.T) / np.outer(norm, qnorm))
            take = min(k, len(ids))
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(qids):
                col, cand = cos[:, j], ids
                self_mask = cand != qid
                col, cand = col[self_mask], cand[self_mask]
                # batch-local top-k under the global (cos DESC, vec_id)
                # comparator — lexsort's last key is primary
                order = np.lexsort((cand, -col))[:take]
                out_q.extend([qid] * len(order))
                out_v.extend(cand[order])
                out_c.extend(col[order])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "vec_id": pd.Series(out_v, dtype="int64"),
                    "cosine": pd.Series(out_c, dtype="float64"),
                }
            )

    partials = v.mapInPandas(score, "query_id long, vec_id long, cosine double")
    return _topk(partials, k)


def lsh_matmul_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
    max_queries: int = 1024,
) -> DataFrame:
    """The composed 100 TB ANN plan: LSH bucket restriction for the
    candidate set + a BLAS GEMM for the scoring — identical results to
    :func:`lsh_bucketed_topk` (same buckets, same rounding, same
    oracle), with the scoring cost of :func:`matmul_topk`.

    Buckets are assigned JVM-side (codegen literals); the corpus then
    groups by bucket and one `applyInPandas` kernel per bucket scores
    its Arrow batch against ONLY that bucket's query vectors with a
    single matmul, emitting bucket-local top-k partials. Queries ride
    to executors in the kernel closure keyed by bucket (driver-bounded
    by ``max_queries``). Shuffle: one hash partition on bucket id —
    exactly the LSH equi-join's shuffle — plus ≤ buckets × queries × k
    partial rows for the final merge window.
    """
    import numpy as np
    import pandas as pd

    from oroboro_dw_dbt_spark.functions.rounding import np_round_half_up

    if len(query_ids) > max_queries:
        raise ValueError(
            f"lsh_matmul_topk collects query vectors onto the driver: got "
            f"{len(query_ids)} query_ids, max_queries={max_queries}"
        )
    planes = lsh_planes(num_planes, dim)
    v = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "bucket", hyperplane_bucket(F.col("v"), planes)
    )
    qrows = sorted(
        v.filter(F.col("vec_id").isin(query_ids)).collect(), key=lambda r: r.vec_id
    )
    by_bucket: dict[int, tuple] = {}
    for r in qrows:
        by_bucket.setdefault(r.bucket, []).append(r)
    q_pack = {
        b: (
            np.array([r.vec_id for r in rs], dtype=np.int64),
            np.array([r.v for r in rs], dtype=np.float64),
        )
        for b, rs in by_bucket.items()
    }
    for b, (qids, qmat) in q_pack.items():
        qnorm = np.sqrt((qmat * qmat).sum(axis=1))
        qnorm[qnorm == 0.0] = 1.0
        q_pack[b] = (qids, qmat, qnorm)

    def score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (bucket,) = key
        pack = q_pack.get(bucket)
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if pack is None or not len(pdf):
            return empty
        qids, qmat, qnorm = pack
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["v"].to_numpy())
        norm = np.sqrt((mat * mat).sum(axis=1))
        norm[norm == 0.0] = 1.0
        # HALF_UP like F.round/DuckDB (np.round is banker's — see rounding.py)
        cos = np_round_half_up((mat @ qmat.T) / np.outer(norm, qnorm))
        out_q, out_v, out_c = [], [], []
        for j, qid in enumerate(qids):
            col, cand = cos[:, j], ids
            mask = cand != qid
            col, cand = col[mask], cand[mask]
            order = np.lexsort((cand, -col))[: min(k, len(cand))]
            out_q.extend([qid] * len(order))
            out_v.extend(cand[order])
            out_c.extend(col[order])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "vec_id": pd.Series(out_v, dtype="int64"),
                "cosine": pd.Series(out_c, dtype="float64"),
            }
        )

    partials = v.groupBy("bucket").applyInPandas(
        score, "query_id long, vec_id long, cosine double"
    )
    return _topk(partials, k)


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_queries: int = 1024,
    fit_sample: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: a seeded KMeans coarse quantizer
    partitions the corpus into cells; each query probes only its
    ``n_probe`` nearest cells and runs exact cosine there.

    The plan shape at 100 TB: one pass to assign cells (model transform
    is a JVM-side expression), cell id becomes the partition key, and
    the probe is an equi-join of a broadcast (query_id, cell) list
    against the assigned corpus — candidates ≈ corpus × n_probe /
    n_centroids, never all-pairs. Centroids live on the driver
    (n_centroids × dim floats — KBs); in production train on a sample,
    not the full corpus.

    Approximate (recall < 1 when a true neighbor sits in an unprobed
    cell) → no cross-engine oracle; tests bound recall against
    brute_force_topk.

    Driver-side guards: the query rows are collected to rank probe
    cells, so ``max_queries`` hard-caps the query-set size (a 10⁶-id
    call must fail loudly, not OOM the driver); the KMeans fit reads at
    most ``fit_sample`` corpus rows (a coarse quantizer needs a sample,
    never the full 100 TB corpus).
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if len(query_ids) > max_queries:
        raise ValueError(
            f"ivf_topk collects query vectors onto the driver: got "
            f"{len(query_ids)} query_ids, max_queries={max_queries}"
        )
    v = emb.select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("_feat", array_to_vector("v"))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_feat").fit(
        v.limit(fit_sample)
    )
    assigned = model.transform(v).select(
        "vec_id", "v", F.col("prediction").alias("cell")
    )

    centers = np.array([c for c in model.clusterCenters()])
    qrows = assigned.filter(F.col("vec_id").isin(query_ids)).collect()
    probes = []  # (query_id, probe_cell) pairs — tiny, broadcast
    for r in qrows:
        qv = np.array(r.v)
        d = ((centers - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probes.append((r.vec_id, int(cell)))
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, cell int")
    qv_df = spark.createDataFrame(
        [(r.vec_id, r.v) for r in qrows], "query_id long, qv array<double>"
    )

    pairs = (
        assigned.join(F.broadcast(probe_df), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(F.broadcast(qv_df), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
        )
    )
    return _topk(pairs, k)


def mips_topk(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Maximum-inner-product top-k via the norm-augmentation reduction
    (Bachrach et al. 2014): append sqrt(M² − |x|²) to every corpus
    vector (M = max corpus norm) and 0 to every query — augmented
    cosine is then ip(q,x)/(|q|·M), MONOTONE in the raw inner product,
    so cosine machinery (here: the same broadcast + fold plan as
    brute_force_topk; at scale: the LSH/IVF/PQ ladder unchanged)
    answers MIPS exactly. Returned ip is the raw inner product and the
    RANKING uses that raw fold ip on both sides (floating-point ulps in
    the augmented route's extra sqrt/normalize could flip near-ties);
    the reduction identity ip = cos(q',x')·|q'|·M is certified per pair
    as the ``aug_consistent`` tolerance boolean instead.
    """
    v = emb.select("vec_id", _as_double("embedding").alias("v"))
    # M² as a 1-row broadcast (exact same fold on every row's norm²)
    msq = v.agg(
        F.max(F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x)).alias("msq")
    )
    aug = v.crossJoin(F.broadcast(msq)).select(
        "vec_id",
        F.concat(
            "v",
            F.array(
                F.sqrt(
                    F.greatest(
                        F.col("msq")
                        - F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x),
                        F.lit(0.0),
                    )
                )
            ),
        ).alias("va"),
        "v",
        "msq",
    )
    q = aug.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.concat("v", F.array(F.lit(0.0))).alias("qa"),
        F.col("v").alias("qv"),
    )
    # the identity ip = cos(q',x')·|q'|·M is certified as a TOLERANCE
    # boolean rather than by ranking through the cosine: the augmented
    # route reconstructs ip only to ~1e-12 relative (ulps in the extra
    # sqrt/normalize), so ranking by it could flip near-ties vs a
    # direct-ip oracle; ranking uses the fold ip on both sides while
    # aug_consistent pins the reduction numerically (1e-9 ≫ noise,
    # and the two quantities are mathematically equal, so the
    # tolerance cannot straddle a data-dependent boundary).
    ip_raw = _dot(F.col("qv"), F.col("v"))
    ip_via_aug = (
        cosine_similarity(F.col("qa"), F.col("va"))
        * _norm(F.col("qa"))
        * F.sqrt(F.col("msq"))
    )
    pairs = (
        F.broadcast(q)
        .join(aug.select("vec_id", "va", "v", "msq"), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(ip_raw, 6).alias("ip"),
            (
                F.abs(ip_via_aug - ip_raw)
                <= F.lit(1e-9) * F.greatest(F.abs(ip_raw), F.lit(1.0))
            ).alias("aug_consistent"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "ip",
            "aug_consistent",
            F.col("rank").cast("int").alias("rank"),
        )
    )
