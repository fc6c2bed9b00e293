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


class TestImageKernelSeam:
    """Round-6: the "swap the parse body, keep the plan" claim made
    executable. `decode_media(image_meta_fn=...)` plugs a different
    image-decoding kernel body into the SAME Arrow plan; results,
    schema, and plan shape must be identical for any conforming body.
    When PIL is importable the real decoder is the auto-detected body
    and is exercised against the header parse; otherwise a
    differently-implemented conforming body proves the seam."""

    @staticmethod
    def _docs(spark):
        return spark.createDataFrame(
            [(0, "a" * 120), (3, "b" * 64), (6, "c" * 99)],  # doc_id%3==0 → image
            "doc_id long, text string",
        )

    @staticmethod
    def _pil_available() -> bool:
        try:
            import PIL  # noqa: F401

            return True
        except ImportError:
            return False

    def test_autodetect_matches_capability(self):
        from oroboro_dw_dbt_spark.multimodal.media import (
            header_image_meta,
            pick_image_meta_fn,
            pil_image_meta,
        )

        expected = pil_image_meta if self._pil_available() else header_image_meta
        assert pick_image_meta_fn() is expected

    def test_swapped_kernel_body_same_schema_plan_and_values(self, spark):
        from oroboro_dw_dbt_spark.multimodal.media import (
            header_image_meta,
            pil_image_meta,
        )

        if self._pil_available():
            alt = pil_image_meta  # the real codec vs the header parse
        else:
            # a conforming body with an independent implementation
            # (numpy byte-view instead of struct.unpack)
            def alt(raw: bytes) -> tuple:
                import numpy as np

                if raw[:2] != b"BM":
                    raise ValueError("not a BMP")
                hdr = np.frombuffer(raw[14:30], dtype="<i4")
                bpp = int(np.frombuffer(raw[28:30], dtype="<u2")[0])
                if int(hdr[0]) != 40 or bpp % 8:
                    raise ValueError("bad DIB header")
                return (int(hdr[1]), abs(int(hdr[2])), bpp // 8)

        media = encode_media_containers(self._docs(spark))
        base = decode_media(media, image_meta_fn=header_image_meta)
        swapped = decode_media(media, image_meta_fn=alt)
        assert base.schema == swapped.schema
        b = sorted(map(tuple, base.collect()))
        s = sorted(map(tuple, swapped.collect()))
        assert b == s and all(r[2] for r in b)  # identical and all ok=true

        # identical plan shape: exactly the encoder's and the decoder's
        # Arrow kernels, nothing else, on both routes
        def shape(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return (plan.count("MapInPandas"), "CartesianProduct" in plan)

        assert shape(base) == shape(swapped) == (2, False)

    def test_bad_image_bytes_flagged_on_either_body(self, spark):
        """A truncated BMP must produce ok=false through any kernel body
        (PIL raises OSError subclasses; the header parse raises
        ValueError — both are the flagged-row contract, not a crash)."""
        bad = spark.createDataFrame(
            [(0, bytearray(b"BM" + b"\x00" * 60))], "doc_id long, payload binary"
        )
        out = {r.doc_id: r for r in decode_media(bad).collect()}
        assert out[0].ok is False and out[0].kind is None


class TestResizeBlocks:
    def test_short_payload_pads_with_zero_blocks(self, spark):
        """Payload shorter than n_blocks: empty spans (equal floor
        boundaries) must emit 0, not crash — the guard the ≥48-byte
        catalog corpus never exercises."""
        from oroboro_dw_dbt_spark.multimodal.media import resize_blocks

        media = spark.createDataFrame(
            [(1, bytearray(b"\x10\x20\x30"))], "doc_id long, payload binary"
        )
        row = resize_blocks(media, n_blocks=16).collect()[0]
        assert row.n_bytes == 3
        assert len(row.resized_hex) == 32
        blocks = [int(row.resized_hex[i : i + 2], 16) for i in range(0, 32, 2)]
        assert set(blocks) >= {0}  # empty spans are zero
        assert {0x10, 0x20, 0x30} <= set(blocks)  # data spans survive

    def test_constant_payload_resizes_to_constant(self, spark):
        from oroboro_dw_dbt_spark.multimodal.media import resize_blocks

        media = spark.createDataFrame(
            [(1, bytearray(b"\x42" * 160))], "doc_id long, payload binary"
        )
        row = resize_blocks(media).collect()[0]
        assert row.resized_hex == "42" * 16


class TestEnergyAndCuts:
    def test_energy_windows_exact(self, spark):
        from oroboro_dw_dbt_spark.multimodal.media import audio_energy_windows

        payload = bytes(range(1, 131))  # 130 bytes -> windows 64/64/2
        media = spark.createDataFrame(
            [(1, payload)], "doc_id long, payload binary"
        )
        rows = {r.win_idx: r for r in audio_energy_windows(media).collect()}
        assert [rows[i].win_len for i in range(3)] == [64, 64, 2]
        assert rows[0].energy == sum(v * v for v in range(1, 65))
        assert rows[1].energy == sum(v * v for v in range(65, 129))
        assert rows[2].energy == 129 * 129 + 130 * 130

    def test_empty_payload_emits_nothing(self, spark):
        from oroboro_dw_dbt_spark.multimodal.media import audio_energy_windows

        media = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
        assert audio_energy_windows(media).count() == 0

    def test_scene_cuts_delta_and_threshold(self, spark):
        from oroboro_dw_dbt_spark.multimodal.media import scene_cuts

        # frame0 = 100x10, frame1 = 100x10 (delta 0), frame2 = 100x60
        payload = bytes([10] * 200 + [60] * 100)
        media = spark.createDataFrame(
            [(1, payload)], "doc_id long, payload binary"
        )
        rows = {r.frame_idx: r for r in scene_cuts(media).collect()}
        assert rows[1].delta == 0 and not rows[1].is_cut
        assert rows[2].delta == 100 * 50 and rows[2].is_cut  # 5000 > 4000

    def test_short_payload_has_no_cuts(self, spark):
        from oroboro_dw_dbt_spark.multimodal.media import scene_cuts

        media = spark.createDataFrame(
            [(1, bytes(150))], "doc_id long, payload binary"  # 1 full frame
        )
        assert scene_cuts(media).count() == 0
