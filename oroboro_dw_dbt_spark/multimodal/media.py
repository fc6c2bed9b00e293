"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
`binary` column next to typed metadata (kind, n_bytes, source), keep
all orchestration in the DataFrame plan, and drop to Arrow-batched
Python (`mapInPandas`) ONLY for the decode/feature kernels — one
Python process per partition, zero per-row overhead, schema declared up
front so Catalyst can prune around it.

The real-codec libraries (PIL / torchaudio / decord) are NOT in this
container, so the decode path runs on dependency-free PUBLIC container
formats instead: `encode_media_containers` wraps payload bytes in
spec-valid BMP / PCM RIFF-WAVE / RIFF-AVI files and `decode_media`
parses the binary headers back (struct.unpack + magic checks, bad files
flagged ok=false, never fatal). `extract_media_features` and
`sample_frames` run deterministic byte-level kernels through the same
plumbing. Every kernel here shares the schema/grouping/Arrow-batch
shape a real codec kernel needs — swap the parse body, keep the plan.

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


# ---------------------------------------------------------------------------
# Real container codec: BMP / WAV / AVI headers, dependency-free
# ---------------------------------------------------------------------------
# The decode path runs REAL bytes in this sandbox: documents become
# spec-valid containers (BITMAPINFOHEADER BMPs, PCM RIFF/WAVE, RIFF/AVI
# with an avih main header), and decode_media parses the binary headers
# back with struct.unpack — the same mapInPandas seam a PIL/torchaudio/
# decord kernel plugs into, but executable and oracle-checkable here
# because the encoded dimensions derive deterministically from n_chars.

DECODE_SCHEMA = (
    "doc_id bigint, kind string, ok boolean, width int, height int, "
    "channels int, sample_rate int, n_units bigint, duration_ms double"
)


def encode_media_containers(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, kind, payload) where payload is a VALID
    media container wrapping the text bytes: BMP for image docs, PCM
    WAV for audio, AVI for video (kind cycles on doc_id % 3 like
    media_from_documents). Container parameters are modular functions
    of n_chars so an SQL oracle can predict what the decoder must read
    back out of the binary."""
    import struct

    pruned = docs.select("doc_id", "text")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def bmp(n: int, body: bytes) -> bytes:
            width, height = n % 31 + 1, n % 17 + 1
            stride = (width * 3 + 3) // 4 * 4
            pix = (body * (stride * height // max(len(body), 1) + 1))[: stride * height]
            header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
            dib = struct.pack(
                "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
            )
            return header + dib + pix

        def wav(n: int, body: bytes) -> bytes:
            channels, rate = 1 + n % 2, 8000 * (1 + n % 3)
            n_samples = n
            data = (body * 2)[: n_samples * 2 * channels].ljust(
                n_samples * 2 * channels, b"\x00"
            )
            fmt = struct.pack(
                "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
            )
            return (
                struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
                + struct.pack("<4sI", b"fmt ", 16)
                + fmt
                + struct.pack("<4sI", b"data", len(data))
                + data
            )

        def avi(n: int, body: bytes) -> bytes:
            width, height = n % 63 + 2, n % 37 + 2
            micro = n % 50000 + 20000  # µs per frame
            frames = n % 300 + 1
            avih = struct.pack(
                "<IIIIIIIIIIIIII",
                micro, 0, 0, 0, frames, 0, 1, 0, width, height, 0, 0, 0, 0,
            )
            hdrl = b"hdrl" + struct.pack("<4sI", b"avih", len(avih)) + avih
            movi = b"movi" + body[:64]
            payload = (
                b"AVI "
                + struct.pack("<4sI", b"LIST", len(hdrl)) + hdrl
                + struct.pack("<4sI", b"LIST", len(movi)) + movi
            )
            return struct.pack("<4sI", b"RIFF", len(payload)) + payload

        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                n = len(text)
                k = ("image", "audio", "video")[doc_id % 3]
                enc = {"image": bmp, "audio": wav, "video": avi}[k]
                ids.append(doc_id)
                kinds.append(k)
                payloads.append(enc(n, body))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return pruned.mapInPandas(kernel, schema="doc_id bigint, kind string, payload binary")


def header_image_meta(raw: bytes) -> tuple:
    """Dependency-free BMP header parse → (width, height, channels).
    The default image kernel body when no codec library is present."""
    import struct

    if not (len(raw) >= 54 and raw[:2] == b"BM"):
        raise ValueError("not a BMP")
    _ = struct.unpack("<2sIHHI", raw[:14])
    size, width, height, _, bpp = struct.unpack("<IiiHH", raw[14:30])
    if size != 40 or bpp % 8:
        raise ValueError("bad DIB header")
    return (width, abs(height), bpp // 8)


def pil_image_meta(raw: bytes) -> tuple:
    """Real-codec image kernel body: PIL parses the bytes, the metadata
    comes from the decoder's own API (size/bands), not our header math.
    Same (width, height, channels) contract as header_image_meta —
    the documented "swap the parse body, keep the plan" seam."""
    import io

    from PIL import Image  # capability-gated at the call site

    img = Image.open(io.BytesIO(raw))
    w, h = img.size
    return (w, h, len(img.getbands()))


def pick_image_meta_fn():
    """Capability detection, evaluated ONCE on the driver: the chosen
    callable is cloudpickled into the Arrow kernel, so executors never
    re-probe (and a PIL-on-driver/no-PIL-on-executor skew would fail
    loudly at task start, not silently fall back)."""
    try:
        import PIL  # noqa: F401

        return pil_image_meta
    except ImportError:
        return header_image_meta


def decode_media(media: DataFrame, image_meta_fn=None) -> DataFrame:
    """Parse each payload's container header into typed metadata —
    entirely from the BYTES (struct.unpack, magic checks), never from
    the row's metadata columns.

    Emits one row per input with ``ok=false`` and null fields when the
    magic/structure doesn't parse (the bad-file row must be flagged,
    not kill the job — same contract as ev_json_typed for JSON). The
    unit fields: image → (width, height, channels, n_units=pixels);
    audio → (channels, sample_rate, n_units=samples, duration_ms);
    video → (width, height, n_units=frames, duration_ms).

    ``image_meta_fn`` is the real-codec seam: a callable
    ``bytes → (width, height, channels)`` executed inside the Arrow
    kernel for image payloads. Default (None) auto-detects — PIL's
    decoder when importable (`pil_image_meta`), the dependency-free
    header parse otherwise — with IDENTICAL plan shape, schema, and
    values either way (pinned in tests/test_multimodal.py). A
    torchaudio/decord deployment swaps the audio/video branches the
    same way."""
    import struct

    if image_meta_fn is None:
        image_meta_fn = pick_image_meta_fn()
    pruned = media.select("doc_id", "payload")

    def parse(raw: bytes) -> tuple:
        # → (kind, width, height, channels, rate, n_units, duration_ms)
        if len(raw) >= 54 and raw[:2] == b"BM":
            width, height, channels = image_meta_fn(raw)
            return ("image", width, height, channels, None,
                    width * height, None)
        if len(raw) >= 44 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
            if raw[12:16] != b"fmt ":
                raise ValueError("missing fmt chunk")
            (fmt_len,) = struct.unpack("<I", raw[16:20])
            _, channels, rate, _, block, bits = struct.unpack("<HHIIHH", raw[20:36])
            data_off = 20 + fmt_len
            if raw[data_off : data_off + 4] != b"data":
                raise ValueError("missing data chunk")
            (data_len,) = struct.unpack("<I", raw[data_off + 4 : data_off + 8])
            n_samples = data_len // block
            # duration is emitted UNROUNDED (Python round is banker's —
            # see functions/rounding.py); consumers round JVM-side
            return ("audio", None, None, channels, rate, n_samples,
                    n_samples * 1000.0 / rate)
        if len(raw) >= 88 and raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
            if raw[12:16] != b"LIST" or raw[20:24] != b"hdrl" or raw[24:28] != b"avih":
                raise ValueError("missing avih")
            vals = struct.unpack("<IIIIIIIIII", raw[32:72])
            micro, frames, width, height = vals[0], vals[4], vals[8], vals[9]
            return ("video", width, height, None, None, frames,
                    micro * frames / 1000.0)
        raise ValueError("unknown container")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    kind, w, h, ch, rate, units, dur = parse(bytes(raw))
                    rows.append((doc_id, kind, True, w, h, ch, rate, units, dur))
                # OSError covers PIL's UnidentifiedImageError on the
                # real-codec path — a bad file is a flagged row, never fatal
                except (ValueError, struct.error, OSError):
                    rows.append((doc_id, None, False, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "ok", "width", "height",
                         "channels", "sample_rate", "n_units", "duration_ms"],
            )

    return pruned.mapInPandas(kernel, schema=DECODE_SCHEMA)


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


RESIZE_BLOCKS = 16
RESIZE_SCHEMA = "doc_id bigint, n_bytes bigint, resized_hex string"


def resize_blocks(media: DataFrame, n_blocks: int = RESIZE_BLOCKS) -> DataFrame:
    """Average-pooling resize over the binary payload: the byte stream
    is split into ``n_blocks`` equal spans (floor boundaries k·n//B) and
    each span reduced to its integer mean — the 1-D analogue of the
    block-average image downsample a real pipeline runs per channel.
    Emits the resized signal as a fixed-length hex string (one 02x pair
    per block) so the schema stays scalar for the driver's hasher.

    The kernel is fully vectorized (numpy cumsum + reduce-at-boundaries,
    no per-byte Python); a PIL deployment swaps it for
    Image.resize(..., BOX) through the same mapInPandas plumbing — the
    same seam as decode_media's image_meta_fn. Row-local: zero shuffle
    at any scale."""
    import numpy as np

    pruned = media.select("doc_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.int64)
                n = len(a)
                bounds = (np.arange(n_blocks + 1) * n) // n_blocks
                csum = np.concatenate(([0], np.cumsum(a)))
                sums = csum[bounds[1:]] - csum[bounds[:-1]]
                lens = np.maximum(bounds[1:] - bounds[:-1], 1)
                means = sums // lens
                out.append(
                    (doc_id, n, "".join(f"{int(v):02x}" for v in means))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "resized_hex"]
            )

    return pruned.mapInPandas(kernel, schema=RESIZE_SCHEMA)


ENERGY_SCHEMA = "doc_id bigint, win_idx int, win_len int, energy bigint"
ENERGY_WIN_BYTES = 64


def audio_energy_windows(
    media: DataFrame, win_bytes: int = ENERGY_WIN_BYTES
) -> DataFrame:
    """Windowed signal energy over the binary payload: fixed ``win_bytes``
    windows (ragged tail kept with its true length), energy = Σ sample²
    as an exact BIGINT — the voice-activity-detection / silence-trim
    primitive of an audio curation pipeline, over the same mapInPandas
    seam a torchaudio kernel would use.

    Vectorized (one cumsum of squares + boundary diff per payload, no
    per-byte Python). Row-local fan-out (1 → n/win rows): zero shuffle
    at any scale; at 100 TB the windows land already partitioned by
    their source file like every other mapInPandas kernel here."""
    import numpy as np

    pruned = media.select("doc_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.int64)
                n = len(a)
                if n == 0:
                    continue
                n_win = (n + win_bytes - 1) // win_bytes
                bounds = np.minimum(np.arange(n_win + 1) * win_bytes, n)
                c2 = np.concatenate(([0], np.cumsum(a * a)))
                energies = c2[bounds[1:]] - c2[bounds[:-1]]
                lens = bounds[1:] - bounds[:-1]
                for i in range(n_win):
                    out.append((doc_id, i, int(lens[i]), int(energies[i])))
            yield pd.DataFrame(
                out, columns=["doc_id", "win_idx", "win_len", "energy"]
            )

    return pruned.mapInPandas(kernel, schema=ENERGY_SCHEMA)


CUTS_SCHEMA = "doc_id bigint, frame_idx int, delta bigint, is_cut boolean"
CUT_THRESHOLD_PER_BYTE = 40


def scene_cuts(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    threshold_per_byte: int = CUT_THRESHOLD_PER_BYTE,
) -> DataFrame:
    """Scene-cut detection over the payload's FULL frames: delta(i) =
    Σ|frame_i − frame_{i−1}| (exact BIGINT), cut where the mean byte
    delta exceeds ``threshold_per_byte`` — the shot-boundary primitive
    video sampling pipelines run before keyframe extraction
    (mm_sample_frames picks frames; this picks WHICH frames matter).

    Vectorized: one reshape + one abs-diff per payload. Only full
    frames participate (the ragged tail has no aligned predecessor).
    Row-local; zero shuffle."""
    import numpy as np

    pruned = media.select("doc_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.int64)
                n_full = len(a) // frame_bytes
                if n_full < 2:
                    continue
                frames = a[: n_full * frame_bytes].reshape(n_full, frame_bytes)
                deltas = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
                for i, d in enumerate(deltas, start=1):
                    out.append(
                        (
                            doc_id,
                            i,
                            int(d),
                            bool(d > threshold_per_byte * frame_bytes),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "delta", "is_cut"]
            )

    return pruned.mapInPandas(kernel, schema=CUTS_SCHEMA)
