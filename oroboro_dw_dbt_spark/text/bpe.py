"""Distributed BPE vocabulary learning (Sennrich et al. 2016).

The production shape for training-tokenizer construction at corpus
scale splits into two regimes:

1. **One heavy distributed pass**: count word *types* — a single
   ``groupBy(word)`` shuffle over the corpus. At 100 TB this is the
   only operation that touches every byte; its output (the word-type
   frequency table) is MB-scale for natural language (Heaps' law), KB
   here.
2. **A compact merge loop over the type table**: each BPE merge step
   counts adjacent symbol pairs weighted by word frequency, picks the
   most frequent pair (ties broken lexicographically), and greedily
   re-segments every word type. State never grows beyond
   |types| × avg word length, so the loop's per-step jobs are tiny
   regardless of corpus size — the same two-phase design HuggingFace
   ``tokenizers`` and SentencePiece use for their counting phase.

Everything stays JVM-side: symbol sequences are space-joined strings,
re-segmentation is an ``F.aggregate`` (fold) Column expression
implementing the standard greedy left-to-right merge, and pair
counting is an ``arrays_zip`` + ``explode`` + ``sum``. The only
driver-side data is the argmax pair per step — the learned merge
table itself (``n_merges`` rows), exactly the artifact a tokenizer
trainer must materialize.

The reference (moizbukhari1996/oroboro-dw-dbt, 3 BigQuery models —
models/marts/core/*.sql) has no tokenizer surface; this extends the
engine per SURVEY §6 (LLM-pipeline families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker symbol (no LIKE wildcards: cross-engine safe)
N_MERGES = 10


def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) over documents.text — the one corpus-scale pass."""
    from oroboro_dw_dbt_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), " +")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def base_symbols(word_col: Column) -> Column:
    """Initial segmentation: characters + trailing EOW, space-joined."""
    return F.array_join(F.concat(F.split(word_col, ""), F.array(F.lit(EOW))), " ")


def apply_merge(syms_str: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right merge of adjacent (lhs, rhs) symbol pairs.

    Fold over the symbol list with a string accumulator: when the
    accumulator's trailing token is exactly ``lhs`` and the next symbol
    is ``rhs``, appending ``rhs`` without a separator concatenates the
    pair into one token. Greedy non-overlap falls out for free: the
    just-merged trailing token ``lhs+rhs`` no longer equals ``lhs``.
    The DuckDB oracle runs the byte-identical fold via ``list_reduce``.
    """
    syms = F.split(syms_str, " ")
    return F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            (x == F.lit(rhs)) & ((acc == F.lit(lhs)) | acc.endswith(F.lit(" " + lhs))),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def train(
    words: DataFrame, n_merges: int = N_MERGES
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """The BPE merge loop: ``n_merges`` (lhs, rhs, pair_count) rules,
    plus the final segmented word-type table (word, freq, s).

    The segmentation column is MATERIALIZED per step (localCheckpoint
    of the KB-scale type table; persist() on a cluster) — applying one
    merge to the stored string, never re-deriving from base characters.
    Re-deriving would nest ``apply_merge`` expressions, and each level
    references its input three times, so the expression tree grows 3^k
    — a codegen blowup by merge 10. The DuckDB oracle's MATERIALIZED
    CTE per step is the same decision for the same reason.

    Each step collects exactly ONE row — the argmax pair — which IS
    the learned state.
    """
    cur = words.select(
        "word", "freq", base_symbols(F.col("word")).alias("s")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        syms = F.split("s", " ")
        top = (
            cur.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(syms, 1, F.size(syms) - 1).alias("l"),
                        F.slice(syms, 2, F.size(syms) - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:  # every word fully merged to one token
            break
        row = top[0]
        merges.append((row["l"], row["r"], int(row["cnt"])))
        cur = cur.withColumn(
            "s", apply_merge(F.col("s"), row["l"], row["r"])
        ).localCheckpoint()
    return merges, cur


def learn_merges(
    words: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Merge rules only (see ``train``)."""
    return train(words, n_merges)[0]


def learn_merges_py(word_freq: dict[str, int], n_merges: int = N_MERGES):
    """Plain-Python reference implementation (tests only)."""
    segs = {w: [*w, EOW] for w in word_freq}
    out = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((lhs, rhs, cnt))
        for w, syms in segs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    merged.append(lhs + rhs)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            segs[w] = merged
    return out
