"""BPE batched-merge probe: counting passes ∝ vocab/batch (VERDICT
r08 Next #6).

Two corpora, deliberately contrasting:

- the REAL test corpus (single-alphabet English): early char merges
  all share 'e'/'</w>', so the provably-sequential-equal selector
  rightly degenerates to ~1 merge/pass — the speedup is
  corpus-dependent, and equality is the contract;
- a MULTI-DOMAIN corpus (disjoint sub-alphabets — the shape of a
  multilingual/multi-script vocab run): top pairs are symbol-
  disjoint, so the selector admits full batches and passes collapse
  to ~n_merges/batch.

Both runs assert merge-table equality against batch=1 before
recording anything.

Usage: python tools/bpe_probe.py OUT.json
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402
from oroboro_dw_dbt_spark.text import bpe  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_bpe_probe.json"
    spark = get_spark("bpe_probe")

    records = []

    # real corpus, 40 merges
    words = bpe.word_counts(spark, "/root/testdata/sf0.001").localCheckpoint(
        eager=True
    )
    for batch in (1, 8):
        t0 = time.monotonic()
        merges, _ = bpe.train(words, n_merges=40, batch=batch)
        records.append(
            {
                "corpus": "sf0.001-english",
                "batch": batch,
                "n_merges": len(merges),
                "passes": bpe.LAST_TRAIN_PASSES,
                "wall": round(time.monotonic() - t0, 2),
                "merges_head": merges[:3],
            }
        )

    # multi-domain corpus: 16 disjoint 2-letter alphabets
    alpha = [chr(ord("a") + i) for i in range(16)]
    corpus = {}
    for d, (x, y) in enumerate(zip(alpha[0::2], alpha[1::2])):
        corpus[x + y + x + y] = 100 - 10 * d
    md = spark.createDataFrame(
        list(corpus.items()), "word string, freq long"
    ).localCheckpoint(eager=True)
    base = None
    for batch in (1, 8):
        t0 = time.monotonic()
        merges, _ = bpe.train(md, n_merges=8, batch=batch)
        if base is None:
            base = merges
        assert merges == base, "batched must equal sequential"
        records.append(
            {
                "corpus": "multi-domain",
                "batch": batch,
                "n_merges": len(merges),
                "passes": bpe.LAST_TRAIN_PASSES,
                "wall": round(time.monotonic() - t0, 2),
            }
        )

    out = {"metric": "bpe_batched_passes", "records": records}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
