"""Deterministic scale-up of the driver testdata for empirical scale probes.

Builds an sfN directory by replicating sf0.1 K times with disjoint key
spaces (every FK chain is shifted by the same per-replica stride, so join
fan-out, group cardinality growth, and selectivity all scale the way a
genuinely bigger TPC-H would: facts ×K, matched dims ×K, fixed dims
constant).

Shape-preserving perturbations keep the non-relational operators honest:

- ``documents.text``: EVERY replica (r=0 included) gets every 3rd token
  suffixed with the replica id — token count unchanged, but w-shingles
  break, so MinHash/LSH sees each replica as a DISTINCT document (the
  within-replica near-dup rate — the statistic dedup cost depends on —
  is preserved; a verbatim copy would instead manufacture K-fold
  duplicate clusters and overstate LSH bucket load). Suffixing r=0 too
  makes CHAINED generations safe: each text encodes its full replica
  path, so no two paths collide (with r=0 skipped, paths (x,y,0) and
  (x,0,y) were byte-identical — 10.0% manufactured exact dups on the
  r11 sf1000 dir vs the 0.16% native rate).
- ``embeddings.embedding``: circular shift by the replica index + a
  (stride, r)-seeded ±1 sign pattern (diagonal orthogonal transform) —
  norms and within-replica inner products exactly preserved, replicas
  decorrelated even under chaining (shifts alone compose additively and
  collide on reordered paths), so ANN top-k at sfN isn't K copies at
  distance zero.
- ``region``/``nation`` stay fixed (TPC-H semantics: constant dims).

Usage:
    python tools/gen_scale.py [out_dir] [replicas] [src_dir]
Defaults: out_dir=/tmp/spark_graft_sf1, replicas=10, src=/root/testdata/sf0.1
(10 × sf0.1 ≈ sf1: 6M lineitem rows).
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-table (shift_cols → stride source table). Strides are max(key)+1 of
# the SOURCE table so replica key ranges are disjoint; every FK uses the
# stride of the table it references, keeping referential integrity exact.
COPY_AS_IS = ("region", "nation")


def _stride(spark: SparkSession, src: str, table: str, key: str) -> int:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    return int(df.agg(F.max(key)).collect()[0][0]) + 1


def _replicate(
    df: DataFrame, replicas: int, shifts: dict[str, int],
    perturb=None,
) -> DataFrame:
    parts = []
    for r in range(replicas):
        p = df
        for col, stride in shifts.items():
            p = p.withColumn(col, (F.col(col) + F.lit(r * stride)).cast("bigint"))
        if perturb is not None:
            p = perturb(p, r)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate(
    spark: SparkSession,
    src: str,
    out: str,
    replicas: int,
    tables: tuple[str, ...] | None = None,
) -> None:
    """``tables`` (optional) restricts the OUTPUT to a subset — e.g.
    the chained-pipeline rungs read only documents+embeddings, and at
    sf300 writing just those costs ~3.5 GB where the full table set
    costs ~48 GB (key strides still come from the full source so ids
    stay consistent with a full generation)."""
    outp = Path(out)
    outp.mkdir(parents=True, exist_ok=True)

    # Strides are computed lazily so a SUBSET source dir (e.g. an sfN
    # rung holding only documents+embeddings) can seed a deeper rung:
    # chaining sf0.1 → sf10 → sf100 → sf1000 keeps union plans ≤ 10
    # parts where a single 10 000-replica generation would not analyze.
    # A subset-sourced stride equals the full-generation stride because
    # the subset tables were themselves written with consistent ids.
    def need(t: str, k: str) -> int:
        if tables and t not in tables and not _references(t, tables):
            return 0
        return _stride(spark, src, t, k)

    def _references(t: str, wanted) -> bool:
        deps = {"orders": ("customer",), "lineitem": ("orders", "part", "supplier"),
                "events": ("customer",)}
        return any(t in deps.get(w, ()) for w in wanted)

    cust = need("customer", "c_custkey")
    supp = need("supplier", "s_suppkey")
    part = need("part", "p_partkey")
    orders = need("orders", "o_orderkey")
    events = need("events", "event_id")
    docs = need("documents", "doc_id")
    vecs = need("embeddings", "vec_id")

    def perturb_doc(df: DataFrame, r: int) -> DataFrame:
        # Suffix every 3rd token: length-preserving shingle breaker.
        # ALL replicas get the suffix, r=0 INCLUDED: chained
        # generations (sfA -> sfB -> sfC) compose suffix strings, and
        # when r=0 skipped perturbation, any two replica paths with
        # the same NONZERO suffix sequence — (x,y,0) and (x,0,y) —
        # produced byte-identical text. On the r11 sf1000 dir
        # (sf100×10 on sf10×10) that manufactured a 10.0% exact-dup
        # excess (native sf0.1 rate: 0.16%) and inflated the LSH
        # stage's per-doc wall 43.5 -> 56+ µs — a corpus artifact the
        # r11 VERDICT flagged as a possible superlinear engine term.
        # With "~0" emitted too, a text encodes its FULL replica path,
        # so paths collide only when they are the same path.
        return df.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t, i: F.when(
                        i % 3 == 0, F.concat(t, F.lit(f"~{r}"))
                    ).otherwise(t),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))

    def perturb_vec(df: DataFrame, r: int) -> DataFrame:
        # Circular shift (wrapped at the vector dim: with replicas >
        # dim a raw r produces a negative slice length — hit at 100
        # replicas × dim-64 vectors) + a (stride, r)-seeded ±1 sign
        # pattern. The shift alone is NOT chain-safe: shifts compose
        # ADDITIVELY, so chained paths (x,0) and (0,x) land on the
        # same total rotation and produce identical vectors — the
        # vector-side twin of the text-suffix collision above. The
        # sign pattern is a diagonal orthogonal transform shared by
        # every vector of a replica: norms and all WITHIN-replica
        # inner products are preserved exactly (the statistics the
        # semantic-dedup probes depend on), while xxhash64(i, r,
        # stride) makes the composed transform distinct per level
        # even at the same total shift.
        n = F.size("embedding")
        s = F.lit(r) % n
        shifted = F.concat(
            F.slice("embedding", s + 1, n - s),
            F.slice("embedding", F.lit(1), s),
        )
        return df.withColumn(
            "embedding",
            F.transform(
                shifted,
                lambda v, i: v
                * (
                    1
                    - 2
                    * F.pmod(
                        F.xxhash64(i, F.lit(r), F.lit(vecs)), F.lit(2)
                    ).cast("int")
                ).cast("float"),
            ),
        )

    plans: dict[str, DataFrame] = {}
    read = lambda t: spark.read.parquet(f"{src}/{t}.parquet")  # noqa: E731

    def want(t: str) -> bool:
        return not tables or t in tables

    for t in COPY_AS_IS:
        if want(t):
            plans[t] = read(t)
    if want("customer"):
        plans["customer"] = _replicate(read("customer"), replicas, {"c_custkey": cust})
    if want("supplier"):
        plans["supplier"] = _replicate(read("supplier"), replicas, {"s_suppkey": supp})
    if want("part"):
        plans["part"] = _replicate(read("part"), replicas, {"p_partkey": part})
    if want("orders"):
        plans["orders"] = _replicate(
            read("orders"), replicas, {"o_orderkey": orders, "o_custkey": cust}
        )
    if want("lineitem"):
        plans["lineitem"] = _replicate(
            read("lineitem"), replicas,
            {"l_orderkey": orders, "l_partkey": part, "l_suppkey": supp},
        )
    if want("events"):
        plans["events"] = _replicate(
            read("events"), replicas, {"event_id": events, "user_id": cust}
        )
    if want("documents"):
        plans["documents"] = _replicate(
            read("documents"), replicas, {"doc_id": docs}, perturb=perturb_doc
        )
    if want("embeddings"):
        plans["embeddings"] = _replicate(
            read("embeddings"), replicas, {"vec_id": vecs}, perturb=perturb_vec
        )

    for t, df in plans.items():
        if tables and t not in tables:
            continue
        # Bound the ROW GROUPS, not just the files: a parquet task can
        # split a file by byte range but never inside a row group, and
        # the writer's flush check estimates the ENCODED size — heavily
        # dictionary-encoded text columns can stream hundreds of raw MB
        # into one row group before the 128 MB estimate trips. The sf100
        # probe hit exactly that: 8 files × ONE 700k-row row group each,
        # so of 33 byte-range splits only the 8 holding row-group
        # midpoints produced rows and the md5-bound shingle stage ran on
        # 8 of 32 cores (measured 26× wall at 10× data — SCALE.md).
        # 16 MB encoded-estimate row groups ≈ 60–80 MB raw text, the
        # same granularity the driver's sf0.1 layout exhibits.
        n_files = 1 if t in COPY_AS_IS else 8
        (
            df.coalesce(n_files)
            .write.mode("overwrite")
            .option("parquet.block.size", 16 * 1024 * 1024)
            .parquet(str(outp / f"{t}.parquet"))
        )
        print(f"wrote {t}", flush=True)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    tables = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    from oroboro_dw_dbt_spark.session import get_spark

    spark = get_spark("gen_scale")
    generate(spark, src, out, replicas, tables)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
