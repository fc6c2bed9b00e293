"""Adversarial hot-bucket dedup probe (VERDICT r08 Next #8).

The star-edge LSH spelling's Σ(b−1) vs Σb²/2 win is argued from
construction; the synthetic ladder never triggers it (sf100 census:
max bucket 12). This probe MANUFACTURES the worst case — a deliberate
mega-cluster of boilerplate near-duplicates (the "terms of service
repeated 100k times" shape every web corpus contains) — and measures
the pair spelling against the star spelling as the cluster grows.

Construction: the sf1 corpus (50k docs) with K docs rewritten as one
~60-token boilerplate plus a single distinguishing token (Jaccard
against each other ≈ 0.95 ≫ 0.5 threshold): their MinHash signatures
nearly all collide, forming one LSH bucket of ~K members per band.
Expected: pairs wall grows ~K² (Σb²), star stays ~K (Σ(b−1)); victim
sets agree (the cluster is mutually similar — the pytest-pinned
equality case).

Usage: python tools/hotbucket_probe.py OUT.json [SF_DIR]
Prints one JSON line; full record to OUT.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import _host_load  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402

BOILER = " ".join(
    f"clause{i} shall govern the use of the service under section{i}"
    for i in range(12)
)  # ~60 tokens of repeated legalese

# cluster-size ladder; the pair spelling is capped where its Σb²/2
# verify count stays tractable on this box (K=16000 → ~512M candidate
# rows before dedup). K=100_000 is recorded star-only: the pair
# spelling's projected cost there is the point of the probe.
K_LADDER = (1_000, 4_000, 16_000)
K_STAR_ONLY = 100_000


def _with_megacluster(spark, sf_dir: str, k: int):
    """Returns (docs, k_effective). k is clamped to the corpus size
    (ADVICE r09: K_STAR_ONLY=100_000 exceeds the sf1 corpus, so the
    rung used to record k=100000 while building a 50k-doc cluster —
    the artifact's own max_bucket contradicted the label)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "n_chars"
    )
    n = docs.count()
    k = min(k, n)
    step = max(1, n // k)
    boiler = F.concat(
        F.lit(BOILER + " variant token"),
        (F.col("doc_id") % 7).cast("string"),
    )
    out = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % step == 0, boiler).otherwise(F.col("text")),
    )
    return out.localCheckpoint(eager=True), k


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_hotbucket.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"

    from oroboro_dw_dbt_spark.dedup.dedup import (
        minhash_band_index,
        minhash_lsh_pairs,
        minhash_lsh_victims,
    )

    spark = get_spark("hotbucket_probe")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    load_before = _host_load()
    rungs = []
    for k_req in (*K_LADDER, K_STAR_ONLY):
        docs, k = _with_megacluster(spark, sf_dir, k_req)
        rec: dict = {"k": k, "k_requested": k_req}

        # bucket census: the work each spelling MUST do, counted from
        # the band index itself (independent of either implementation)
        idx = minhash_band_index(docs).localCheckpoint(eager=True)
        census = (
            idx.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("b"))
            .agg(
                F.max("b").alias("max_bucket"),
                F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("sum_pairs"),
                F.sum(F.col("b") - 1).alias("sum_star_edges"),
            )
            .collect()[0]
        )
        rec["max_bucket"] = int(census["max_bucket"])
        rec["sum_pairs"] = int(census["sum_pairs"])
        rec["sum_star_edges"] = int(census["sum_star_edges"])

        t0 = time.monotonic()
        star_victims = minhash_lsh_victims(docs)
        rec["star_victims"] = star_victims.count()
        rec["star_wall"] = round(time.monotonic() - t0, 3)

        if k in K_LADDER:
            t0 = time.monotonic()
            pairs = minhash_lsh_pairs(docs)
            pair_victims = (
                pairs.groupBy(F.col("doc_b").alias("doc_id"))
                .agg(F.count(F.lit(1)))
                .select("doc_id")
            )
            rec["pair_victims"] = pair_victims.count()
            rec["pairs_wall"] = round(time.monotonic() - t0, 3)
            # mutually-similar mega-cluster: victim sets must agree
            only_star = star_victims.join(
                pair_victims, "doc_id", "left_anti"
            ).count()
            rec["victims_agree"] = bool(
                only_star == 0 and rec["star_victims"] <= rec["pair_victims"]
            )
        else:
            rec["pairs_wall"] = None  # projected quadratic — the point
        rungs.append(rec)
        print(json.dumps(rec))

    load_after = _host_load()
    out = {
        "metric": "hotbucket_pairs_vs_star",
        "unit": "sec",
        "sf_dir": sf_dir,
        "rungs": rungs,
        "load": {
            "before": load_before,
            "after": load_after,
            "steal_jiffies_delta": (
                load_after.get("steal_jiffies", 0)
                - load_before.get("steal_jiffies", 0)
            ),
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
