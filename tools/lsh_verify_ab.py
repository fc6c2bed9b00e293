"""A/B probe for the LSH star-victims verify spelling (VERDICT r09
Next #5): NEW — one checkpoint of (sig, vh bigint hashes), verify
joins vh — vs OLD (r09) — checkpoint the band index, re-scan +
re-shingle candidate docs for a string-array verify.

Same corpus, same session, interleaved runs so host noise hits both.
Asserts identical victim sets before reporting walls.

Usage: python tools/lsh_verify_ab.py OUT.json [SF_DIR] [repeat]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import _host_load  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402


def old_victims(docs, n=3, num_hashes=8, band_rows=2, threshold=0.5):
    """The r09 spelling: band-index checkpoint + candidate re-shingle."""
    from oroboro_dw_dbt_spark.dedup.dedup import minhash_band_index
    from oroboro_dw_dbt_spark.text.analysis import shingles

    index = minhash_band_index(docs, n, num_hashes, band_rows)
    index = index.localCheckpoint(eager=True)
    rep = index.groupBy("band", "band_key").agg(F.min("doc_id").alias("rep"))
    edges = (
        index.join(rep, ["band", "band_key"])
        .where(F.col("doc_id") > F.col("rep"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .dropDuplicates()
    )
    edges = edges.localCheckpoint(eager=True)
    cand_ids = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .unionByName(edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = docs.join(cand_ids, "doc_id").select(
        "doc_id", shingles("text", n).alias("sh")
    )
    sh = sh.localCheckpoint(eager=True)
    jac = (
        F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh"))).cast("double")
        / F.size(F.array_union(F.col("sa.sh"), F.col("sb.sh")))
    )
    return (
        edges.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(F.round(jac, 6) >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_lsh_verify_ab.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf30"
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from oroboro_dw_dbt_spark.dedup.dedup import minhash_lsh_victims
    from oroboro_dw_dbt_spark.text.pipeline import quality_filter

    spark = get_spark("lsh_verify_ab")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    corpus = (
        docs.join(quality_filter(docs).where("keep").select("doc_id"), "doc_id")
        .localCheckpoint(eager=True)
    )
    n_docs = corpus.count()

    def timed(fn):
        l0 = _host_load()
        t0 = time.monotonic()
        victims = fn(corpus)
        n = victims.count()
        wall = round(time.monotonic() - t0, 3)
        l1 = _host_load()
        return wall, n, l1.get("steal_jiffies", 0) - l0.get("steal_jiffies", 0)

    # victim-set identity once (collect both, compare)
    new_set = {r["doc_id"] for r in minhash_lsh_victims(corpus).collect()}
    old_set = {r["doc_id"] for r in old_victims(corpus).collect()}
    identical = new_set == old_set

    runs = []
    for r in range(repeat):
        w_new, n_new, s_new = timed(minhash_lsh_victims)
        w_old, n_old, s_old = timed(old_victims)
        runs.append(
            {
                "new_wall": w_new, "old_wall": w_old,
                "new_steal": s_new, "old_steal": s_old,
                "speedup": round(w_old / w_new, 3) if w_new else None,
            }
        )
        print(json.dumps(runs[-1]))

    out = {
        "metric": "lsh_verify_ab",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "victims": len(new_set),
        "victim_sets_identical": identical,
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
