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
    return apply_merges(syms_str, [(lhs, rhs)])


def apply_merges(syms_str: Column, rules: list[tuple[str, str]]) -> Column:
    """Greedy left-to-right application of several SYMBOL-DISJOINT
    merge rules in ONE fold (expression size linear in ``len(rules)``,
    never the 3^k nesting of chained folds).

    Disjointness makes one combined scan equivalent to applying the
    rules one-at-a-time: a rule's merge sites are decided by local
    (lhs, rhs) adjacency, and merging (a, b) can only create or
    destroy an adjacency for a rule sharing one of {a, b, ab} — which
    the batch selector excludes. At most one rule can fire per
    position (rhs values are distinct), and a just-merged trailing
    token equals no rule's lhs (merged tokens are fresh and disjoint
    from other rules' symbols), so within-rule greedy non-overlap is
    preserved exactly as in the single-rule fold."""
    syms = F.split(syms_str, " ")

    def step(acc: Column, x: Column) -> Column:
        expr = F.concat(acc, F.lit(" "), x)
        for lhs, rhs in rules:
            expr = F.when(
                (x == F.lit(rhs))
                & ((acc == F.lit(lhs)) | acc.endswith(F.lit(" " + lhs))),
                F.concat(acc, x),
            ).otherwise(expr)
        return expr

    return F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1), F.element_at(syms, 1), step
    )


# Merge-batch size: each counting pass admits up to this many merges.
# Real 50k-vocab runs pay vocab/batch driver round-trips instead of
# vocab (VERDICT r08 Next #6); the certified 10-merge entries see
# identical merges either way (the selector only batches when
# provably equal to sequential).
_BPE_BATCH = 8

# Pass counter for the jobs ∝ vocab/batch probe (tools/bpe_probe):
# number of pair-counting passes the last train() call ran.
LAST_TRAIN_PASSES = 0


def _select_batch(
    rows, vocab: set[str], max_m: int, k_window: int
) -> list[tuple[str, str, int]]:
    """From one sorted pair-count window, the maximal merge prefix
    PROVABLY identical to sequential BPE's next choices.

    Scanning (cnt desc, l, r): select while candidates are pairwise
    symbol-disjoint and their merged tokens are fresh (not an existing
    symbol). Sequential equality argument: applying earlier selected
    merges (i) leaves every later selected candidate's count unchanged
    (disjoint), (ii) only DECREASES existing pairs that touch the
    merged symbols (fresh tokens ⇒ no existing pair gains), and (iii)
    creates new pairs (x, ab)/(ab, y) whose counts are bounded by the
    batch-time counts of (x, a)/(b, y) — pairs that touch the selected
    set and therefore rank at or below the scan's stop point. To close
    the tie case (a new pair matching a selected count could win a
    lexicographic tie), the selection keeps only merges with count
    STRICTLY above the stop-point count; the top-1 is always kept (it
    is sequential's argmax by definition)."""
    sel: list[tuple[str, str, int]] = []
    touched: set[str] = set()
    stop_cnt = None
    for i, row in enumerate(rows):
        l, r, cnt = row["l"], row["r"], int(row["cnt"])
        tok = l + r
        if (
            len(sel) >= max_m
            or l in touched
            or r in touched
            or (sel and (tok in vocab or tok in touched))
        ):
            stop_cnt = cnt
            break
        sel.append((l, r, cnt))
        touched.update((l, r, tok))
        if i == 0 and tok in vocab:
            # argmax's token collides with an existing symbol: its
            # application can RAISE existing (x, tok) pair counts, so
            # nothing below is trustworthy this pass
            if len(rows) > 1:
                stop_cnt = int(rows[1]["cnt"])
            break
    else:
        # exhausted the collected window: pairs below it are unknown
        # but count ≤ the window's last row
        stop_cnt = int(rows[-1]["cnt"]) if len(rows) >= k_window else None
    if stop_cnt is not None:
        sel = sel[:1] + [m for m in sel[1:] if m[2] > stop_cnt]
    return sel


def train(
    words: DataFrame, n_merges: int = N_MERGES, batch: int = _BPE_BATCH
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """The BPE merge loop: ``n_merges`` (lhs, rhs, pair_count) rules,
    plus the final segmented word-type table (word, freq, s).

    The segmentation column is MATERIALIZED per pass (localCheckpoint
    of the KB-scale type table; persist() on a cluster) — applying the
    pass's merges to the stored string, never re-deriving from base
    characters. Re-deriving would nest ``apply_merge`` expressions,
    and each level references its input three times, so the expression
    tree grows 3^k — a codegen blowup by merge 10. The DuckDB oracle's
    MATERIALIZED CTE per step is the same decision for the same reason.

    Batched selection (VERDICT r08 Next #6): each counting pass
    collects a top-K window (K = 4·batch) and admits up to ``batch``
    merges via :func:`_select_batch` — only prefixes provably equal
    to sequential BPE, so the learned merge table is bit-identical to
    ``batch=1`` (property-tested against the plain-Python reference).
    Driver round-trips drop from ``n_merges`` to ~``n_merges/batch``
    — the difference between 50k jobs and ~6k on a real vocab run.
    """
    global LAST_TRAIN_PASSES
    cur = words.select(
        "word", "freq", base_symbols(F.col("word")).alias("s")
    ).localCheckpoint()
    # exact symbol vocabulary, maintained driver-side: base symbols
    # once (alphabet-scale), then every merged token. Freshness checks
    # against it keep the batch selector sound.
    vocab: set[str] = {
        r["t"]
        for r in cur.select(
            F.explode(F.split("s", " ")).alias("t")
        ).distinct().collect()
    }
    merges: list[tuple[str, str, int]] = []
    passes = 0
    k_window = max(2, 4 * batch)
    while len(merges) < n_merges:
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
            .limit(k_window)
            .collect()
        )
        passes += 1
        if not top:  # every word fully merged to one token
            break
        sel = _select_batch(
            top, vocab, min(batch, n_merges - len(merges)), k_window
        )
        merges.extend(sel)
        vocab.update(l + r for l, r, _ in sel)
        cur = cur.withColumn(
            "s", apply_merges(F.col("s"), [(l, r) for l, r, _ in sel])
        ).localCheckpoint()
    LAST_TRAIN_PASSES = passes
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
