from oroboro_dw_dbt_spark.multimodal.media import (
    decode_media,
    extract_media_features,
    media_from_documents,
    sample_frames,
)

__all__ = [
    "decode_media",
    "extract_media_features",
    "media_from_documents",
    "sample_frames",
]
