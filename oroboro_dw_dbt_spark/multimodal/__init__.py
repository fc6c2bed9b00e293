from oroboro_dw_dbt_spark.multimodal.media import (
    perceptual_hash,
    phash_near_dup_pairs,
    decode_media,
    encode_media_containers,
    extract_media_features,
    media_from_documents,
    sample_frames,
)

__all__ = [
    "perceptual_hash",
    "phash_near_dup_pairs",
    "decode_media",
    "encode_media_containers",
    "extract_media_features",
    "media_from_documents",
    "sample_frames",
]
