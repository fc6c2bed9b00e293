from oroboro_dw_dbt_spark.similarity.quantize import int8_codes, int8_quantize
from oroboro_dw_dbt_spark.similarity.stats import label_centroids
from oroboro_dw_dbt_spark.similarity.search import (
    brute_force_topk,
    lsh_matmul_topk,
    matmul_topk,
    cosine_similarity,
    hyperplane_bucket,
    ivf_topk,
    lsh_bucketed_topk,
    lsh_multiprobe_topk,
    lsh_planes,
)

__all__ = [
    "brute_force_topk",
    "lsh_matmul_topk",
    "matmul_topk",
    "cosine_similarity",
    "hyperplane_bucket",
    "int8_codes",
    "int8_quantize",
    "ivf_topk",
    "label_centroids",
    "lsh_bucketed_topk",
    "lsh_multiprobe_topk",
    "lsh_planes",
]
