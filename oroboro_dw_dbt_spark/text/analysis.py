"""Text-analysis primitives for large-scale training-data pipelines.

Everything here is a pure Column expression built from Spark's
higher-order array functions (transform / filter / aggregate / zip_with)
— JVM-side, whole-stage-codegen-friendly, no Python UDFs. At 100 TB
that's the difference between a scan-speed pass and a 10-100× Arrow
round-trip penalty (see /opt/skills/guides/pyspark_guide.md on UDF cost).

Covered: tokenization, token counting (whitespace + BPE-ish regex),
punctuation/stopword ratios, a composite quality score, n-gram
heuristic language ID, document fingerprinting (md5 whole-doc + min
shingle rolling fingerprint), w-shingling, MinHash signatures, and a
16-bit SimHash — the standard dedup/quality toolkit (cf. Lee et al.,
"Deduplicating Training Data Makes Language Models Better", 2022;
Broder, "On the resemblance and containment of documents", 1997).

Design note: every function has an exact SQL twin in the DuckDB oracle
(operators/training_suite.py) — md5-based hashing keeps the two engines
bit-identical, unlike engine-native hash() functions which differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram heuristic.
# Real pipelines plug fastText/CLD3 via mapInPandas (multimodal.py shows
# the plumbing); the heuristic itself is the classic stopword-hit model.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"),
    "es": ("el", "la", "los", "y", "es", "una", "no", "por", "que", "con"),
}

BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
PUNCT_CLASS = r"[.,!?;:]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text — array<string>."""
    return F.split(F.trim(_col(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of BPE-ish segments: letter runs, digit runs, single marks."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    t = _col(text)
    n = F.length(t)
    n_punct = n - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.when(n > 0, n_punct.cast("double") / n).otherwise(F.lit(0.0))


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t)))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        _hits(toks, LANG_STOPWORDS[lang]).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] heuristic: length band + low punctuation +
    stopword presence + lexical diversity. Weights are illustrative; the
    structure (cheap per-doc signals, no model) is the Gopher/C4-style
    quality-filter shape."""
    t = _col(text)
    toks = tokens(t)
    n_tok = F.size(toks)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(t) < 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(t) > 0.0, 1.0).otherwise(0.0)
    diversity = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    return F.round(0.3 * len_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.3 * diversity, 6)


def lang_id(text: Column | str) -> Column:
    """Stopword-hit argmax over {en, de, fr, es}; 'und' when no hits.
    Fixed tie-break order en > de > fr > es (>= comparisons)."""
    toks = tokens(text)
    hits = {lang: _hits(toks, words) for lang, words in LANG_STOPWORDS.items()}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    return (
        F.when(en + de + fr + es == 0, "und")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )


def doc_fingerprint(text: Column | str) -> Column:
    """md5 of the whitespace-normalized, lowercased document."""
    return F.md5(F.concat_ws(" ", F.transform(tokens(_col(text)), F.lower)))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles (w-shingling, Broder 1997)."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def min_shingle_fingerprint(text: Column | str, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: min md5 over n-gram shingles —
    one stable representative shingle hash per document."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


def minhash_signature(shingle_col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as array<string> — hash h is the min over
    shingles of an 8-hex-char CHUNK of a salted md5: md5('<k>|'+s)
    yields 4 independent 32-bit hashes, so 8 hashes cost 2 md5 calls per
    shingle instead of 8. md5 keeps Spark and the SQL oracle
    bit-identical (engine hash() functions differ); lexicographic min
    over fixed-width hex = numeric min.

    Prefer `with_minhash_signature` on a DataFrame — it names the salted
    md5 arrays as intermediate columns evaluated once per row; this
    expression form re-evaluates them per hash."""

    def salted_chunk(h: int):
        k, i = divmod(h, 4)
        return lambda s: F.substring(F.md5(F.concat(F.lit(f"{k}|"), s)), 1 + 8 * i, 8)

    return F.array(
        *[F.array_min(F.transform(shingle_col, salted_chunk(h))) for h in range(num_hashes)]
    )


def with_minhash_signature(
    df,
    shingles_col: str = "sh",
    num_hashes: int = 8,
    out: str = "sig",
    verify_out: str | None = None,
):
    """Add a MinHash signature column, evaluating each salted md5 array
    ONCE per row (named intermediates cross a projection boundary, so
    all chunk-mins share them).

    ``verify_out`` (optional): also emit a compact exact-verify column —
    the distinct shingle set re-expressed as ``array<bigint>`` of 60-bit
    md5 prefixes (``conv(substr(md5('0|'+s),1,15),16,10)``), reusing the
    SAME salted md5 array the signature mins over, so it costs zero
    extra hashing. Jaccard over these arrays equals shingle-Jaccard
    modulo 60-bit collisions, and the encoding is engine-portable
    (DuckDB: ``CAST('0x'||substr(md5('0|'||s),1,15) AS BIGINT)``), so an
    oracle restating the same hash is bit-identical by construction.
    8-byte primitive arrays are ~2-3x smaller than the shingle strings
    they stand in for — the difference between a checkpointable verify
    state and the sf100 string-array thrash (dedup.py history)."""
    n_md5 = (num_hashes + 3) // 4

    def salted(k: int):
        return lambda s: F.md5(F.concat(F.lit(f"{k}|"), s))

    tmp = df
    for k in range(n_md5):
        tmp = tmp.withColumn(f"_mh{k}", F.transform(F.col(shingles_col), salted(k)))

    def chunk(i: int):
        return lambda m: F.substring(m, 1 + 8 * i, 8)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col(f"_mh{h // 4}"), chunk(h % 4)))
            for h in range(num_hashes)
        ]
    )
    tmp = tmp.withColumn(out, sig)
    if verify_out is not None:
        tmp = tmp.withColumn(
            verify_out,
            F.array_distinct(
                F.transform(
                    F.col("_mh0"),
                    lambda m: F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint"),
                )
            ),
        )
    return tmp.drop(*[f"_mh{k}" for k in range(n_md5)])


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over distinct tokens (Charikar 2002).

    Bit j's vote per token is the high bit of hex digit j of md5(token)
    (chars 0-7 → +1, 8-f → −1); bit j of the result is set when the
    summed vote is positive. Pure array aggregates — and reproducible in
    ANSI SQL, which engine-native hash functions are not.
    """
    toks = F.array_distinct(tokens(_col(text)))
    md5s = F.transform(toks, F.md5)

    def vote_fn(j: int):
        return lambda acc, m: acc + F.when(
            F.substring(m, j + 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), 1
        ).otherwise(-1)

    out = F.lit(0)
    for j in range(16):
        vote = F.aggregate(md5s, F.lit(0), vote_fn(j))
        out = out + F.when(vote > 0, F.lit(2**j)).otherwise(F.lit(0))
    return out


def tfidf_top_terms(docs, k: int = 3, doc_id: str = "doc_id", text: str = "text"):
    """Top-``k`` TF-IDF terms per document — the corpus-statistics shape
    (explode fan-out → two partial aggs → token-keyed join → per-doc
    window top-k; the fan-out collapses map-side, the window's top-k is
    rank-limited, never a full sort of the corpus vocabulary).

    tfidf = tf · ln(n_docs / df), rounded to 6 before BOTH the ranking
    and the output so the DuckDB oracle orders identically; rank ties
    break on the token string (SURVEY §2.5 W4 lesson: every window gets
    a total order)."""
    from pyspark.sql.window import Window

    tf = (
        docs.select(doc_id, F.explode(tokens(text)).alias("token"))
        .groupBy(doc_id, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(doc_id).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(doc_id).orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(doc_id, "token", F.col("tf").cast("bigint").alias("tf"), "tfidf",
                F.col("rank").cast("int").alias("rank"))
    )
