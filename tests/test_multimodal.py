"""The container codec (multimodal/media.py): real bytes in, real
headers parsed back — including the malformed-payload path the catalog
fixture (all-valid containers) can never exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.multimodal import decode_media, encode_media_containers
from oroboro_dw_dbt_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


class TestContainerCodec:
    def test_roundtrip_fields_match_encoding_rule(self, spark):
        docs = spark.createDataFrame(
            [(0, "x" * 100), (1, "y" * 100), (2, "z" * 100)],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in decode_media(encode_media_containers(docs)).collect()}
        img = rows[0]
        assert (img.kind, img.ok) == ("image", True)
        assert (img.width, img.height, img.channels) == (100 % 31 + 1, 100 % 17 + 1, 3)
        assert img.n_units == img.width * img.height
        aud = rows[1]
        assert (aud.kind, aud.ok) == ("audio", True)
        assert (aud.channels, aud.sample_rate) == (1 + 100 % 2, 8000 * (1 + 100 % 3))
        assert aud.n_units == 100
        assert abs(aud.duration_ms - 100 * 1000.0 / aud.sample_rate) < 1e-9
        vid = rows[2]
        assert (vid.kind, vid.ok) == ("video", True)
        assert (vid.width, vid.height) == (100 % 63 + 2, 100 % 37 + 2)
        assert vid.n_units == 100 % 300 + 1

    def test_payloads_are_spec_valid_containers(self, spark):
        """Magic bytes + declared sizes hold on every encoded payload of
        the real fixture — the containers are files, not just blobs."""
        docs = load_table(spark, SF, "documents").limit(60)
        for r in encode_media_containers(docs).collect():
            raw = bytes(r.payload)
            if r.kind == "image":
                assert raw[:2] == b"BM"
                assert int.from_bytes(raw[2:6], "little") == len(raw)
            else:
                assert raw[:4] == b"RIFF"
                assert raw[8:12] == (b"WAVE" if r.kind == "audio" else b"AVI ")
                assert int.from_bytes(raw[4:8], "little") == len(raw) - 8

    def test_malformed_payloads_flagged_not_fatal(self, spark):
        """Truncated/garbage/wrong-magic bytes: the row comes back
        ok=false with null fields; the batch survives."""
        bad = spark.createDataFrame(
            [
                (1, bytearray(b"")),                      # empty
                (2, bytearray(b"BM\x01\x02")),            # truncated BMP
                (3, bytearray(b"RIFF\x10\x00\x00\x00JUNK" + b"\x00" * 80)),  # wrong form
                (4, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 100)),  # unsupported
            ],
            "doc_id long, payload binary",
        )
        rows = {r.doc_id: r for r in decode_media(bad).collect()}
        assert all(not r.ok for r in rows.values())
        assert all(r.kind is None and r.n_units is None for r in rows.values())

    def test_mixed_good_and_bad_batch(self, spark):
        docs = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
        good = encode_media_containers(docs)
        bad = spark.createDataFrame(
            [(99, bytearray(b"not media"))], "doc_id long, payload binary"
        )
        out = decode_media(good.select("doc_id", "payload").unionByName(bad))
        got = {r.doc_id: r.ok for r in out.collect()}
        assert got == {0: True, 99: False}

    def test_duration_rounding_stays_jvm_side(self, spark):
        """decode_media emits unrounded duration; the catalog entry
        rounds with F.round (HALF_UP) — kernel-side Python round would
        be banker's (functions/rounding.py)."""
        docs = load_table(spark, SF, "documents").limit(30)
        decoded = decode_media(encode_media_containers(docs))
        rounded = decoded.withColumn("duration_ms", F.round("duration_ms", 6))
        for r, rr in zip(decoded.collect(), rounded.collect()):
            if r.duration_ms is not None:
                assert abs(r.duration_ms - rr.duration_ms) <= 5e-7
