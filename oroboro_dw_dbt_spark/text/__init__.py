from oroboro_dw_dbt_spark.text.analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    min_shingle_fingerprint,
    minhash_signature,
    punct_ratio,
    quality_score,
    shingles,
    simhash16,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "bpe_ish_token_count",
    "doc_fingerprint",
    "lang_id",
    "min_shingle_fingerprint",
    "minhash_signature",
    "punct_ratio",
    "quality_score",
    "shingles",
    "simhash16",
    "stopword_ratio",
    "token_count",
    "tokens",
]
