from oroboro_dw_dbt_spark.dedup.fuzzy import blocked_fuzzy_match
from oroboro_dw_dbt_spark.dedup.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_band_index,
    minhash_lsh_pairs,
    minhash_lsh_victims,
    prefix_filter_pairs,
    ngram_jaccard_pairs,
    simhash_groups,
    simhash_hamming_pairs,
)

__all__ = [
    "blocked_fuzzy_match",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "minhash_band_index",
    "minhash_lsh_pairs",
    "minhash_lsh_victims",
    "prefix_filter_pairs",
    "ngram_jaccard_pairs",
    "simhash_groups",
    "simhash_hamming_pairs",
]
