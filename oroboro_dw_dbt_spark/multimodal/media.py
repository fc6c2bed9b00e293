"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
`binary` column next to typed metadata (kind, n_bytes, source), keep
all orchestration in the DataFrame plan, and drop to Arrow-batched
Python (`mapInPandas`) ONLY for the decode/feature kernels — one
Python process per partition, zero per-row overhead, schema declared up
front so Catalyst can prune around it.

The real decode kernels (PIL / torchaudio / decord) are NOT in this
container, so `decode_media` gates them behind an import-try and raises
NotImplementedError; `extract_media_features` and `sample_frames` run a
deterministic byte-level kernel through the SAME plumbing (schema,
grouping, Arrow batch shape), so the Spark-side contract is fully real
and fully tested — swap the kernel body, keep the plan.

Payloads here are derived from documents.text (UTF-8 bytes) — ASCII by
construction, which lets the DuckDB oracle state the same features over
the text column (operators/training_suite.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 100  # bytes per synthetic "frame"

FEATURES_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, first_byte int, last_byte int"
)
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents → media table: binary payload + typed metadata.
    kind cycles image/audio/video on doc_id (metadata only)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.
    The kernel (bytes → scalars) is where a real pipeline calls the
    decoder; the plumbing — mapInPandas, declared schema, column
    pruning of untouched fields — is the production shape."""
    pruned = media.select("doc_id", "kind", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                }
            )

    return pruned.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling: explode each payload into ⌈n/frame_bytes⌉ fixed-
    size 'frames' with a deterministic md5 per frame — the video-
    frame-sample plumbing (1 input row → k output rows) through
    mapInPandas, with the fan-out declared in the output schema."""
    import hashlib

    pruned = media.select("doc_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(n):
                    chunk = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return pruned.mapInPandas(kernel, schema=FRAMES_SCHEMA)


def decode_media(media: DataFrame, kind: str = "image") -> DataFrame:
    """Real decoder entry point — gated on the actual libraries.

    In this container the import fails and this raises
    NotImplementedError; on a cluster with the decode deps installed the
    same mapInPandas shape runs (see extract_media_features for the
    exercised twin)."""
    try:  # pragma: no cover - decode libs absent by design
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires pillow/torchaudio/decord, which are "
            "not installed here; the Arrow plumbing is exercised via "
            "extract_media_features/sample_frames instead"
        ) from e
    raise NotImplementedError("decoder wiring reserved for real deployments")


PHASH_BLOCKS = 16


def perceptual_hash(media: DataFrame, n_blocks: int = PHASH_BLOCKS) -> DataFrame:
    """Byte-level perceptual hash over the binary payload: bit b is set
    iff block b's byte-sum exceeds its pro-rata share of the whole
    payload's sum (integer cross-multiply — no float division, so any
    engine derives identical bits). Similar payloads flip few bits:
    the locality property a real pHash (DCT over decoded pixels) has,
    computed here over raw bytes through the same Arrow kernel seam the
    decoder would use.

    All comparisons are exact integer arithmetic; the DuckDB oracle
    restates them over the UTF-8 text twin byte-for-byte."""

    pruned = media.select("doc_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                total = sum(payload)
                h = 0
                for b in range(n_blocks):
                    s, e = (b * n) // n_blocks, ((b + 1) * n) // n_blocks
                    block = payload[s:e]
                    # block_mean > total_mean  ⇔  sum_b·n > total·len_b
                    if sum(block) * n > total * (e - s):
                        h |= 1 << b
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int32"),
                }
            )

    return pruned.mapInPandas(kernel, schema="doc_id bigint, phash int")


def phash_near_dup_pairs(
    media: DataFrame, k: int = 1, n_blocks: int = PHASH_BLOCKS
) -> DataFrame:
    """Media near-dup pairs with perceptual-hash Hamming distance ≤ k,
    via the same pigeonhole banding as SimHash (dedup/dedup.py): split
    the ``n_blocks``-bit hash into k+1 bands — a pair within Hamming k
    agrees on at least one whole band — and verify bit_count(xor) on
    band collisions only. O(collisions), never all-pairs over payloads."""
    n_bands = k + 1
    band_bits = n_blocks // n_bands
    hashed = perceptual_hash(media, n_blocks)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("phash"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    idx = hashed.select("doc_id", "phash", F.explode(bands).alias("bk")).select(
        "doc_id", "phash", F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val")
    )
    a, b = idx.alias("a"), idx.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
        .dropDuplicates()
    )
