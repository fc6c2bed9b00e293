"""BPE ENCODE throughput at corpus scale (VERDICT r10 Next #7).

Training is certified and batched; encode is the pipeline's hot path
(every doc, every epoch) and until now had only sf0.01 evidence. Two
measurements on a corpus-scale word stream:

1. **type-join spelling** (the 100 TB design): learn merges, encode
   the distinct-word TYPE table once (KB/MB at any corpus size —
   Zipf), then broadcast-join word → token string over the corpus and
   explode to a token census. Corpus cost = one hash join + explode;
   the fold never touches corpus rows. Reported as µs per corpus
   token, training excluded.

2. **fold linearity in rules**: the `apply_merges` fold evaluates
   K CASE branches per symbol, so per-token cost should be ~linear in
   K. Measured directly on the corpus word stream with K synthetic
   never-firing rules (cost is branch evaluation, not firing) for
   K = 8..64. A super-linear curve is the ticket for the merge-trie
   Arrow kernel (single hash-lookup per adjacent pair instead of K
   branch tests).

Usage: python tools/bpe_encode_probe.py OUT.json [SF_DIR]
Prints one JSON line; full record to OUT.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import _await_quiet_host, _host_load  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402
from oroboro_dw_dbt_spark.text import bpe  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_bpe_encode_probe.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf100"

    spark = get_spark("bpe_encode_probe")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
    gate = _await_quiet_host()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    words = docs.select(
        F.explode(F.split(F.lower("text"), "\\s+")).alias("word")
    ).where(F.col("word") != "")
    words = words.localCheckpoint(eager=True)
    n_tokens = words.count()

    # ---- 1. type-join encode ------------------------------------------
    types = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .localCheckpoint(eager=True)
    )
    n_types = types.count()
    merges, seg = bpe.train(types, n_merges=40)  # seg = encoded types
    seg = seg.select("word", "s").localCheckpoint(eager=True)

    load0 = _host_load()
    t0 = time.monotonic()
    census = (
        words.join(F.broadcast(seg), "word")
        .select(F.explode(F.split("s", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("n").alias("total_out_tokens"),
        )
        .collect()[0]
    )
    join_wall = round(time.monotonic() - t0, 3)
    load1 = _host_load()

    out = {
        "metric": "bpe_encode_probe",
        "sf_dir": sf_dir,
        "n_corpus_tokens": n_tokens,
        "n_word_types": n_types,
        "n_merges": len(merges),
        "type_join_encode": {
            "wall": join_wall,
            "us_per_token": round(join_wall * 1e6 / max(1, n_tokens), 4),
            "out_tokens": int(census["total_out_tokens"]),
            "out_vocab": int(census["vocab"]),
            "steal": load1.get("steal_jiffies", 0) - load0.get("steal_jiffies", 0),
        },
        "fold_linearity": [],
        "quiet_gate": gate,
    }

    # ---- 2. fold cost vs rule count -----------------------------------
    # never-firing rules over symbols outside the corpus alphabet: the
    # fold pays its K branch tests per symbol either way
    for k in (8, 16, 32, 64):
        rules = [(f"\x01{i}", f"\x02{i}") for i in range(k)]
        t0 = time.monotonic()
        n = (
            words.select(
                F.size(
                    F.split(bpe.apply_merges(bpe.base_symbols(F.col("word")), rules), " ")
                ).alias("ns")
            )
            .agg(F.sum("ns"))
            .collect()[0][0]
        )
        wall = round(time.monotonic() - t0, 3)
        out["fold_linearity"].append(
            {
                "k_rules": k,
                "wall": wall,
                "us_per_token": round(wall * 1e6 / max(1, n), 4),
                "symbols_scanned": int(n),
            }
        )
        print(json.dumps(out["fold_linearity"][-1]))

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
