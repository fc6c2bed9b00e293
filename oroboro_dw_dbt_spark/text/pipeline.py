"""Corpus-pipeline operators: decontamination, chunking, PII redaction,
repetition signals, incremental corpus dedup.

These are the steps a large-scale training-data build runs between "raw
documents" and "training shards" (cf. Brown et al., GPT-3 appendix C
decontamination; Rae et al., Gopher §A.1.1 repetition filters; Penedo et
al., FineWeb). Everything row-local is a pure Column tree (whole-stage
codegen); the only shuffles are the ones the semantics require:

- decontamination shuffles N-GRAM HASHES of the (small) benchmark side
  and broadcasts them — the 100 TB corpus is scanned once, never
  shuffled;
- incremental dedup anti-joins the NEW BATCH (small) against corpus
  fingerprints — shuffle is proportional to the batch, and a bloom-
  filter pre-pass on fingerprint can cut the corpus scan further;
- chunking fans out rows but is shuffle-free (posexplode of a per-row
  computed array).

Every operator has an exact DuckDB twin in operators/pipeline_suite.py;
hashing is md5-only so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.text.analysis import _col, doc_fingerprint, tokens

# --------------------------------------------------------------------------
# n-gram primitives (non-distinct variant; analysis.shingles is distinct)
# --------------------------------------------------------------------------


def gram_list(text: Column | str, n: int) -> Column:
    """ALL n-token grams in order (duplicates kept — repetition metrics
    need multiplicity). Docs shorter than n tokens yield a single
    whole-doc gram."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def gram_hashes(text: Column | str, n: int) -> Column:
    """Distinct md5 hashes of the n-token grams — the join key for
    decontamination (hash, not gram text, crosses the shuffle)."""
    return F.array_distinct(F.transform(gram_list(text, n), F.md5))


# --------------------------------------------------------------------------
# Decontamination: benchmark n-gram overlap
# --------------------------------------------------------------------------


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-train-doc benchmark contamination: docs sharing >= 1 exact
    n-gram with any benchmark doc, with collision counts.

    The classic eval-decontamination pass (GPT-3 used 13-grams; n is a
    knob). Scale shape: the benchmark side is tiny relative to a 100 TB
    corpus, so its exploded gram hashes are BROADCAST — the corpus is
    scanned once, grams hashed in codegen, and only matching (doc, gram)
    pairs survive to the aggregation. No corpus shuffle.

    Returns (doc_id, n_collisions, n_benchmark_docs) for contaminated
    docs only — at scale you anti-join this against the corpus to drop
    them.
    """
    t_grams = train.select(
        F.col(doc_id).alias("doc_id"), F.explode(gram_hashes(text, n)).alias("g")
    )
    b_grams = benchmark.select(
        F.col(doc_id).alias("bench_id"), F.explode(gram_hashes(text, n)).alias("g")
    )
    return (
        t_grams.join(F.broadcast(b_grams), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_collisions"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


# --------------------------------------------------------------------------
# Token-window chunking
# --------------------------------------------------------------------------


def token_chunks(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Overlapping token-window chunks: starts 0, stride, 2·stride, …
    < n_tokens; each chunk is ``chunk_size`` tokens (the final ones
    shorter). The context-window packing step of a training pipeline.

    Shuffle-free fan-out: the chunk array is computed per row and
    posexploded — no shuffle, and the expansion factor is bounded by
    n_tokens/stride. Emits the chunk's md5 rather than its text so the
    output stays narrow; real shard writers emit the token slice itself.
    """
    toks = tokens(text)
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride))
    chunk = lambda s: F.slice(toks, s + 1, chunk_size)  # noqa: E731
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.size(chunk(s)).alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk(s))).alias("chunk_md5"),
        ),
    )
    return docs.select(
        F.col(doc_id).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.start").cast("int").alias("start"),
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------

# Deliberately simple patterns that mean the same thing in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"[0-9]{2}-[0-9]{3}-[0-9]{4}",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """{kind: count} of PII matches — Column expressions."""
    t = _col(text)
    return {k: F.size(F.regexp_extract_all(t, F.lit(p), 0)) for k, p in PII_PATTERNS.items()}


def pii_redact(text: Column | str) -> Column:
    """Replace every PII match with its ``[KIND]`` token. Order of
    application is the fixed dict order (EMAIL before PHONE), so digit
    runs inside an already-redacted email can't double-match."""
    out = _col(text)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind}]")
    return out


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style)
# --------------------------------------------------------------------------


def repetition_signals(
    docs: DataFrame, n: int = 2, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-doc within-document repetition metrics (Rae et al., Gopher
    §A.1.1): the duplicate-n-gram fraction and the fraction of
    characters covered by the single most frequent n-gram.

    Row-local only — shuffle-free at any corpus size. The mode (most
    frequent gram) is found in ONE ``F.aggregate`` pass over the SORTED
    gram array (run-length argmax), O(g log g) per doc, with the sorted
    array materialized once in its own projection. The naive nested form
    (filter-count per distinct gram, re-expanded per output column) is
    O(d·g) × 5 columns and blows past the codegen method-size limit —
    observed to hang at sf0.01.

    Tie-break for the top gram: highest count, then lexicographically
    GREATEST gram — pinned identically in the SQL twin (SURVEY §2.5 W4:
    every argmax gets a total order). The ascending sort makes ``run >=
    best_cnt`` pick exactly that: among equal counts, the later (greater)
    gram wins.
    """
    sorted_grams = F.array_sort(gram_list(text, n))
    staged = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.length(_col(text)).cast("double").alias("_n_chars"),
        sorted_grams.alias("_sg"),
    )

    def _step(acc: Column, g: Column) -> Column:
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run >= acc["best_cnt"]
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, g).otherwise(acc["best_gram"]).alias("best_gram"),
        )

    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_cnt"),
        F.lit(None).cast("string").alias("best_gram"),
    )
    agged = staged.select(
        "doc_id",
        "_n_chars",
        F.size("_sg").alias("_n_grams"),
        F.size(F.array_distinct("_sg")).alias("_n_distinct"),
        F.aggregate("_sg", zero, _step).alias("_m"),
    )
    return agged.select(
        "doc_id",
        F.col("_n_grams").cast("bigint").alias("n_grams"),
        F.round(
            F.lit(1.0) - F.col("_n_distinct").cast("double") / F.col("_n_grams"), 6
        ).alias("dup_gram_frac"),
        F.col("_m.best_gram").alias("top_gram"),
        F.col("_m.best_cnt").cast("bigint").alias("top_gram_count"),
        F.round(
            F.col("_m.best_cnt") * F.length("_m.best_gram") / F.col("_n_chars"), 6
        ).alias("top_gram_char_frac"),
    )


# --------------------------------------------------------------------------
# Incremental corpus dedup
# --------------------------------------------------------------------------


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Documents of ``batch`` that survive dedup against an existing
    corpus AND within the batch itself (first doc_id per fingerprint
    wins — deterministic, retry-stable).

    The daily-ingest shape: the batch is small relative to the corpus,
    so the anti-join shuffles ONLY fingerprints (md5 strings), and the
    corpus side is reduced to distinct fingerprints before the join. At
    100 TB the corpus fingerprint set is itself large but narrow
    (16 bytes/row); a bloom filter built from batch fingerprints can
    pre-filter the corpus scan to cut it further (the runtime-filter
    pattern AQE applies to selective joins automatically).
    """
    b = batch.select(
        F.col(doc_id).alias("doc_id"), doc_fingerprint(text).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    in_batch = (
        b.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    corpus_fps = corpus.select(doc_fingerprint(text).alias("fingerprint")).distinct()
    return in_batch.join(corpus_fps, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


# --------------------------------------------------------------------------
# Composite quality filter (C4/Gopher-style keep-or-drop with reasons)
# --------------------------------------------------------------------------

# (name, predicate-builder) in evaluation order; first failure names the
# drop reason — auditable filtering, the shape every corpus build wants
# (C4 kept only a keep-bit; FineWeb logs per-rule stats).
QUALITY_MIN_TOKENS = 25
QUALITY_MAX_TOKENS = 5000
QUALITY_MIN_DIVERSITY = 0.35


def quality_filter(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-doc keep/drop with the FIRST failing rule as ``reason``:

    1. ``too_short``     — fewer than 25 whitespace tokens
    2. ``too_long``      — more than 5000
    3. ``low_diversity`` — distinct/total token ratio < 0.35
       (the cheap stand-in for Gopher's repetition family; the full
       signals live in :func:`repetition_signals`)
    4. ``no_stopwords``  — zero stopword hits in every known language
       (gibberish / non-linguistic content)

    Row-local Column tree, zero shuffle; at 100 TB this runs at scan
    speed and the corpus write is partitioned by ``keep`` so the kept
    shards are contiguous.
    """
    from oroboro_dw_dbt_spark.text.analysis import LANG_STOPWORDS, _hits

    toks = tokens(text)
    n_tok = F.size(toks)
    diversity = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    sw_hits = None
    for words in LANG_STOPWORDS.values():
        h = _hits(toks, words)
        sw_hits = h if sw_hits is None else sw_hits + h
    reason = (
        F.when(n_tok < QUALITY_MIN_TOKENS, "too_short")
        .when(n_tok > QUALITY_MAX_TOKENS, "too_long")
        .when(diversity < QUALITY_MIN_DIVERSITY, "low_diversity")
        .when(sw_hits == 0, "no_stopwords")
    )
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


# --------------------------------------------------------------------------
# Intra-corpus chunk dedup with document reassembly (C4 line-dedup shape)
# --------------------------------------------------------------------------


def dedup_chunks(
    docs: DataFrame,
    chunk_tokens: int = 10,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Remove corpus-wide duplicate chunks and reassemble documents.

    The C4 cleaning step ("discard any line that appears elsewhere in
    the corpus, keep the first occurrence") generalized to fixed
    ``chunk_tokens``-token windows, since this corpus has no line
    structure. Pipeline:

    1. chunk every doc into consecutive token windows (row-local);
    2. keep each distinct chunk's FIRST occurrence — row_number over a
       window partitioned by the chunk CONTENT, ordered by
       (doc_id, chunk_idx): one shuffle, keyed on the chunk (at 100 TB
       hash the chunk to a 128-bit key for the shuffle and keep the
       text beside it; identical plan);
    3. reassemble survivors per doc in original order (second shuffle,
       on doc_id) and report kept/dropped counts per document.

    Both shuffles carry one row per CHUNK, never all-pairs; the
    dedup-by-content window is the exact-groupBy dedup shape of
    dd_exact applied to sub-document granularity.
    """
    toks = tokens(text)
    base = docs.select(
        F.col(doc_id).alias("doc_id"),
        toks.alias("_toks"),
        F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int").alias("_nch"),
    )
    chunk_of = lambda i: F.array_join(  # noqa: E731
        F.slice("_toks", i * chunk_tokens + 1, chunk_tokens), " "
    )
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.col("_nch") - 1), chunk_of)
        ).alias("chunk_idx", "chunk"),
    )
    first = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    kept = (
        chunks.withColumn("_rn", F.row_number().over(first))
        .filter(F.col("_rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        )
    )
    return (
        base.select("doc_id", F.col("_nch").cast("bigint").alias("_n_chunks"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("_n_chunks") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# Shard packing (token-budget assignment for training-shard writes)
# --------------------------------------------------------------------------


def pack_shards(
    docs: DataFrame,
    budget: int = 2000,
    group_col: str | list[str] = "source",
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Assign documents to token-budgeted training shards, sequentially
    WITHIN each ``group_col`` value: docs ordered by id, exclusive
    prefix-sum of token counts, ``shard = prefix // budget``. A shard
    overflows its budget by at most one document — the standard greedy
    contiguous pack (shard readers want contiguous doc ranges anyway).

    Scale shape: the running sum is windowed PER GROUP, so the work is
    embarrassingly parallel across sources and no global single-task
    window exists (the classic ORDER BY-the-world trap). Training
    corpora shard per source for mixing control, so the grouping is the
    semantics, not a concession. One source dominating the corpus still
    serializes ITS window — for that, pass a composite grouping
    (``["source", "ingest_date"]`` or a deterministic doc_id band) so
    the sequential unit stays bounded; shard ids are then per-subgroup,
    which shard manifests already accommodate.
    """
    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    n_tok = F.size(tokens(text))
    w = Window.partitionBy(*group_cols).orderBy(F.col(doc_id).asc())
    prefix = F.coalesce(
        F.sum(n_tok).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    group_out = (
        [F.col(group_cols[0]).alias("source")]
        if len(group_cols) == 1
        else [F.col(c) for c in group_cols]
    )
    return docs.select(
        *group_out,
        F.col(doc_id).alias("doc_id"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.floor(prefix / budget).cast("int").alias("shard_id"),
        prefix.cast("bigint").alias("tokens_before"),
    )
