"""Multimodal plumbing tests: schema, Arrow batch shapes, explode-based
frame sampling, and the deterministic decode stub. The decode itself is
a stand-in (no media libs in this container, see
stepist_spark/operators/multimodal.py); everything around it — the
distributed path — is real and asserted here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=30).cache()


class TestSyntheticMedia:
    def test_schema_matches_media_schema(self, media):
        assert [f.name for f in media.schema.fields] == [
            f.name for f in mm.MEDIA_SCHEMA.fields
        ]
        assert dict(media.dtypes)["payload"] == "binary"

    def test_kinds_partitioned(self, media):
        kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
        assert kinds == {"image", "audio", "video"}


class TestExtractFeatures:
    def test_feature_shape_and_determinism(self, media):
        out = mm.extract_features(media)
        rows = {r["media_id"]: r for r in out.collect()}
        assert len(rows) == 30
        for r in rows.values():
            assert len(r["feature"]) == 8
            assert abs(sum(r["feature"]) - 1.0) < 1e-9  # histogram normalized
            assert r["n_bytes"] > 0
        # deterministic across runs (stub derives features from bytes only)
        again = {r["media_id"]: r for r in mm.extract_features(media).collect()}
        assert all(rows[i]["feature"] == again[i]["feature"] for i in rows)

    def test_null_payload_safe(self, spark):
        df = spark.createDataFrame(
            [(1, "image", None)], "media_id long, kind string, payload binary"
        )
        (r,) = mm.extract_features(df).collect()
        assert r["n_bytes"] == 0 and r["feature"] == [0.0] * 8

    def test_stub_decoder_is_swappable(self, spark, media, monkeypatch):
        monkeypatch.setattr(mm, "DECODER", lambda b: [float(len(b or b""))])
        (r,) = mm.extract_features(media.limit(1)).collect()
        assert r["feature"] == [float(r["n_bytes"])]


class TestSampleFrames:
    def test_grid_matches_duration(self, media):
        out = mm.sample_frames(media, every_ms=1000)
        per_video = {
            r["media_id"]: r["n"]
            for r in out.groupBy("media_id").agg(F.count("*").alias("n")).collect()
        }
        durations = {
            r["media_id"]: r["meta"]["duration_ms"]
            for r in media.filter(F.col("kind") == "video").collect()
        }
        assert set(per_video) == set(durations)
        for mid, n in per_video.items():
            assert n == durations[mid] // 1000 + 1  # inclusive grid

    def test_only_video_rows(self, media):
        out = mm.sample_frames(media)
        ids = {r["media_id"] for r in out.select("media_id").distinct().collect()}
        assert ids == {r["media_id"] for r in media.filter("kind = 'video'").collect()}


class TestAudioWindows:
    def test_hop_grid_and_short_tracks(self, spark):
        from stepist_spark.operators.multimodal import sample_audio_windows, synthetic_media

        media = synthetic_media(spark, n=12)
        out = sample_audio_windows(media, window_ms=1000, hop_ms=500)
        rows = {(r["media_id"], r["window_start_ms"]): r["window_end_ms"] for r in out.collect()}
        # media_id 1 (audio): duration 100ms < window -> single capped window
        assert rows[(1, 0)] == 100
        # media_id 10 (audio): duration 1000ms -> one full window
        assert rows[(10, 0)] == 1000
        # only audio rows pass the kind filter
        kinds = {r["media_id"] % 3 for r in out.collect()}
        assert kinds == {1}


class TestResize:
    def test_deterministic_resize_stub(self, spark):
        from stepist_spark.operators.multimodal import resize_images, synthetic_media

        media = synthetic_media(spark, n=9)
        out = resize_images(media, width=8, height=4).collect()
        assert len(out) == 3  # only image rows (media_id % 3 == 0)
        for r in out:
            assert r["n_bytes_out"] == 32 and len(r["payload"]) == 32
        # deterministic across runs
        again = resize_images(media, width=8, height=4).collect()
        assert sorted(r["payload"] for r in out) == sorted(r["payload"] for r in again)


class TestProfileMedia:
    def test_fused_pass_matches_separate_operators(self, spark):
        from stepist_spark.operators.multimodal import (
            extract_features,
            profile_media,
            resize_images,
            synthetic_media,
        )

        media = synthetic_media(spark, n=30).cache()
        fused = profile_media(media, width=8, height=4)
        feats = {r["media_id"]: (r["n_bytes"], r["byte_mean"], list(r["feature"]))
                 for r in extract_features(media).collect()}
        resized = {r["media_id"]: (r["width"], r["height"], r["n_bytes_out"])
                   for r in resize_images(media, 8, 4).collect()}
        rows = fused.collect()
        assert len(rows) == 30
        for r in rows:
            assert (r["n_bytes"], r["byte_mean"], list(r["feature"])) == feats[r["media_id"]]
            if r["kind"] == "image":
                assert (r["width"], r["height"], r["n_bytes_out"]) == resized[r["media_id"]]
                assert len(r["payload_out"]) == 32
            else:  # non-image rows carry NULL resize columns
                assert r["width"] is None and r["n_bytes_out"] is None
                assert r["payload_out"] is None
        media.unpersist()


def test_profile_media_null_payload_non_image(spark):
    """A non-image row with a NULL payload must yield NULL resize
    columns, not crash the batch (len(None))."""
    from stepist_spark.operators.multimodal import profile_media

    rows = [
        (1, "image", bytearray(b"abcd")),
        (2, "audio", None),
        (3, "video", bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: r for r in profile_media(df, width=4, height=2).collect()}
    assert got[1].n_bytes_out == 8 and got[1].payload_out is not None
    assert got[2].n_bytes_out is None and got[2].payload_out is None
    assert got[2].n_bytes == 0
    assert got[3].n_bytes_out is None and got[3].payload_out is None


def _codec_b():
    """Second synthetic codec for the injection seam: XOR-checksum
    feature, structurally different from the histogram stub. Returned
    as a closure so cloudpickle ships it BY VALUE (a module-level test
    function would pickle by reference and fail to import on the
    executor)."""

    def codec(b):
        if b is None or len(b) == 0:
            return [0.0, 0.0]
        x = 0
        for v in b[:64]:
            x ^= v
        return [float(x), float(len(b))]

    return codec


class TestDecoderSeam:
    """Round-3 VERDICT #7: the decoder= parameter must swap the decode
    step without touching the GATED byte/grid accounting columns."""

    def test_profile_media_accepts_decoder(self, spark, media):
        base = {r.media_id: r for r in mm.profile_media(media, 4, 2).collect()}
        swapped = {
            r.media_id: r
            for r in mm.profile_media(media, 4, 2, decoder=_codec_b()).collect()
        }
        assert base.keys() == swapped.keys()
        changed = 0
        for mid, b in base.items():
            s = swapped[mid]
            # gated accounting columns are decoder-invariant
            assert (b.n_bytes, b.width, b.height, b.n_bytes_out, b.payload_out) == (
                s.n_bytes, s.width, s.height, s.n_bytes_out, s.payload_out
            )
            assert len(s.feature) == 2  # the swapped codec's shape
            changed += b.feature != s.feature
        assert changed > 0, "swapping the decoder changed nothing"

    def test_extract_features_accepts_decoder(self, media):
        rows = mm.extract_features(media, decoder=_codec_b()).collect()
        assert all(len(r.feature) == 2 for r in rows)
        nonempty = [r for r in rows if r.n_bytes > 0]
        assert nonempty and all(r.feature[1] == float(r.n_bytes) for r in nonempty)


class TestDecodeQuarantine:
    """Round-6 verdict #4: a real decoder backend RAISES on corrupt
    payloads; one bad file must quarantine its row (decode_error set,
    feature NULL), never kill the Spark task."""

    @staticmethod
    def _pil_shaped_decoder():
        """A fake with a real backend's shape: validates a magic
        header, 'opens' the buffer, derives (width, height)-style
        numbers, and RAISES on anything it cannot parse — exactly how
        a PIL.Image.open(BytesIO(payload)) wrapper behaves."""

        def decode(payload: bytes) -> list[float]:
            if payload is None or len(payload) < 4 or payload[:4] != b"IMG1":
                raise ValueError("cannot identify image file")
            body = payload[4:]
            w, h = (len(body) % 17) + 1, (len(body) % 11) + 1
            return [float(w), float(h), float(len(body)), float(body[0])]

        return decode

    @staticmethod
    def _mixed_media(spark):
        rows = [
            (1, "image", "image/png", b"IMG1" + bytes(range(32))),
            (2, "image", "image/png", b"GARBAGE-NOT-AN-IMAGE"),
            (3, "image", "image/png", b"IMG1" + bytes(range(7))),
            (4, "image", "image/png", None),
        ]
        return spark.createDataFrame(
            rows, "media_id long, kind string, mime string, payload binary"
        )

    def test_corrupt_payloads_quarantine_not_crash(self, spark):
        out = {
            r.media_id: r
            for r in mm.extract_features(
                self._mixed_media(spark), decoder=self._pil_shaped_decoder()
            ).collect()
        }
        assert out[1].decode_error is None and len(out[1].feature) == 4
        assert out[3].decode_error is None and len(out[3].feature) == 4
        for bad in (2, 4):
            assert out[bad].feature is None
            assert "ValueError" in out[bad].decode_error
            assert "identify" in out[bad].decode_error
        # accounting columns survive on quarantined rows
        assert out[2].n_bytes == 20 and out[4].n_bytes == 0

    def test_profile_media_quarantines_too(self, spark):
        out = {
            r.media_id: r
            for r in mm.profile_media(
                self._mixed_media(spark), 4, 2, decoder=self._pil_shaped_decoder()
            ).collect()
        }
        assert out[1].decode_error is None and out[2].feature is None
        assert "ValueError" in out[2].decode_error
        # resize accounting is decoder-independent (stub resizer)
        assert out[2].n_bytes_out == 8

    def test_default_stub_never_quarantines(self, media):
        rows = mm.extract_features(media).collect()
        assert all(r.decode_error is None for r in rows)

    def test_module_decoder_swap_path(self, spark, monkeypatch):
        """The documented production swap: assign DECODER and every
        operator picks it up without per-call wiring."""
        monkeypatch.setattr(mm, "DECODER", self._pil_shaped_decoder())
        out = mm.extract_features(self._mixed_media(spark)).collect()
        errs = {r.media_id: r.decode_error for r in out}
        assert errs[1] is None and errs[2] is not None


class TestResizeQuarantine:
    """Round-7 ADVICE: the resize step must quarantine like the feature
    decode — a corrupt image that throws in a real resize backend sets
    decode_error and NULLs the resize columns, never kills the task."""

    @staticmethod
    def _throwing_resizer():
        def resize(payload: bytes) -> bytes:
            if payload is None or payload[:4] != b"IMG1":
                raise OSError("broken data stream when reading image file")
            return payload[4:8] * 2
        return resize

    def test_resize_failure_quarantines_row(self, spark):
        src = TestDecodeQuarantine._mixed_media(spark)
        out = {
            r.media_id: r
            for r in mm.profile_media(
                src, 4, 2, resizer=self._throwing_resizer()
            ).collect()
        }
        # good image: resized through the injected backend
        assert out[1].payload_out == bytes(range(4)) * 2
        assert out[1].n_bytes_out == 8
        # corrupt + NULL payloads: resize columns NULL, error recorded
        for bad in (2, 4):
            assert out[bad].payload_out is None
            assert out[bad].n_bytes_out is None
            assert "OSError" in out[bad].decode_error
        # the default (stub) decoder succeeded, so the error column
        # carries the RESIZE failure — and feature is still present
        assert out[2].feature is not None

    def test_decode_error_wins_when_both_fail(self, spark):
        src = TestDecodeQuarantine._mixed_media(spark)
        out = {
            r.media_id: r
            for r in mm.profile_media(
                src,
                4,
                2,
                decoder=TestDecodeQuarantine._pil_shaped_decoder(),
                resizer=self._throwing_resizer(),
            ).collect()
        }
        assert "ValueError" in out[2].decode_error  # decoder error wins
        assert out[2].payload_out is None


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="PIL not installed in this environment",
)
class TestRealCodecDecode:
    """Round-7 verdict task #5: when a REAL codec library is present,
    certify the actual decode path through the DECODER seam for free —
    skipped cleanly in codec-less sandboxes (the stub stays the
    documented default there)."""

    @staticmethod
    def _png_bytes(w: int, h: int, color) -> bytes:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    @staticmethod
    def _pil_decoder():
        def decode(payload: bytes) -> list[float]:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L")
            px = list(img.getdata())
            return [
                float(img.width),
                float(img.height),
                float(sum(px)) / len(px),
                float(min(px)),
                float(max(px)),
            ]

        return decode

    def test_real_png_decodes_through_seam(self, spark):
        rows = [
            (1, "image", "image/png", self._png_bytes(8, 4, (255, 255, 255))),
            (2, "image", "image/png", self._png_bytes(3, 5, (0, 0, 0))),
            (3, "image", "image/png", b"NOT-A-PNG"),
        ]
        src = spark.createDataFrame(
            rows, "media_id long, kind string, mime string, payload binary"
        )
        out = {
            r.media_id: r
            for r in mm.extract_features(src, decoder=self._pil_decoder()).collect()
        }
        assert out[1].feature[:2] == [8.0, 4.0] and out[1].feature[2] == 255.0
        assert out[2].feature[:2] == [3.0, 5.0] and out[2].feature[2] == 0.0
        assert out[3].feature is None and out[3].decode_error is not None

    def test_real_resize_through_seam(self, spark):
        import io

        from PIL import Image

        def resizer(payload: bytes) -> bytes:
            img = Image.open(io.BytesIO(payload)).resize((4, 2))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()

        src = spark.createDataFrame(
            [(1, "image", "image/png", self._png_bytes(8, 4, (10, 20, 30)))],
            "media_id long, kind string, mime string, payload binary",
        )
        (row,) = mm.profile_media(src, 4, 2, resizer=resizer).collect()
        back = Image.open(io.BytesIO(row.payload_out))
        assert back.size == (4, 2)
        assert row.decode_error is None


class TestBmpCodec:
    def _rgb(self, w=13, h=7, seed=40):
        import numpy as np

        y, x = np.mgrid[0:h, 0:w]
        return np.stack(
            [
                (seed * 7 + 3 * x + 5 * y) % 256,
                (seed * 11 + x + 2 * y) % 256,
                (seed * 13 + 5 * x + y) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)

    def test_roundtrip_odd_width_padding(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_bmp24, encode_bmp24

        rgb = self._rgb(w=13, h=7)  # stride 40 != 39: padding is real
        bmp = encode_bmp24(rgb)
        assert len(bmp) == 54 + 40 * 7
        assert np.array_equal(decode_bmp24(bmp), rgb)

    def test_roundtrip_aligned_width(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_bmp24, encode_bmp24

        rgb = self._rgb(w=16, h=4)  # stride == w*3: no padding branch
        assert np.array_equal(decode_bmp24(encode_bmp24(rgb)), rgb)

    def test_geometry_checksum_detects_row_flip(self):
        import numpy as np

        from stepist_spark.operators.multimodal import (
            bmp_feature_decoder,
            encode_bmp24,
        )

        rgb = self._rgb()
        f_ok = bmp_feature_decoder(encode_bmp24(rgb))
        f_flip = bmp_feature_decoder(encode_bmp24(rgb[::-1]))
        assert f_ok[2:5] == f_flip[2:5]  # channel sums are layout-blind
        assert f_ok[5] != f_flip[5]      # the weighted sum is not

    def test_corrupt_payloads_raise(self):
        import pytest

        from stepist_spark.operators.multimodal import decode_bmp24, encode_bmp24

        bmp = encode_bmp24(self._rgb())
        for bad in (None, b"", b"PNG" + bmp[3:], bmp[:60]):
            with pytest.raises(ValueError):
                decode_bmp24(bad)

    def test_quarantine_through_extract_features(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.multimodal import (
            bmp_feature_decoder,
            extract_features,
            synthetic_bmp_media,
        )

        ids = spark.range(4).select(F.col("id").alias("media_id"))
        media = synthetic_bmp_media(ids, width=13, height=7)
        # corrupt one payload: real decode must quarantine THAT row only
        poisoned = media.withColumn(
            "payload",
            F.when(F.col("media_id") == 2, F.encode(F.lit("junk"), "utf-8"))
            .otherwise(F.col("payload")),
        )
        rows = {
            r["media_id"]: r
            for r in extract_features(poisoned, decoder=bmp_feature_decoder).collect()
        }
        assert rows[2]["feature"] is None and "ValueError" in rows[2]["decode_error"]
        for mid in (0, 1, 3):
            assert rows[mid]["decode_error"] is None
            assert rows[mid]["feature"][0] == 13.0 and rows[mid]["feature"][1] == 7.0

    def test_pil_cross_codec_parity(self):
        import importlib.util

        import pytest

        if importlib.util.find_spec("PIL") is None:
            pytest.skip("PIL not installed — BMP cross-codec check skipped")
        import io

        import numpy as np
        from PIL import Image

        from stepist_spark.operators.multimodal import encode_bmp24

        rgb = self._rgb()
        im = np.array(Image.open(io.BytesIO(encode_bmp24(rgb))).convert("RGB"))
        assert np.array_equal(im, rgb)


class TestWavCodec:
    def _samples(self, n=240, seed=45):
        import numpy as np

        i = np.arange(n, dtype=np.int64)
        return ((seed * 31 + i * 7) % 65536 - 32768).astype("<i2")

    def test_roundtrip(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_wav16, encode_wav16

        s = self._samples()
        rate, back = decode_wav16(encode_wav16(s, 8000))
        assert rate == 8000 and np.array_equal(back, s)

    def test_chunk_walk_skips_junk(self):
        import struct

        import numpy as np

        from stepist_spark.operators.multimodal import decode_wav16, encode_wav16

        s = self._samples()
        wav = encode_wav16(s, 16000)
        junk = struct.pack("<4sI", b"LIST", 6) + b"INFO\x00\x00"
        wav = wav[:36] + junk + wav[36:]
        wav = wav[:4] + struct.pack("<I", len(wav) - 8) + wav[8:]
        rate, back = decode_wav16(wav)
        assert rate == 16000 and np.array_equal(back, s)

    def test_odd_chunk_padding(self):
        import struct

        import numpy as np

        from stepist_spark.operators.multimodal import decode_wav16, encode_wav16

        # odd-length junk chunk: the walker must honor the pad byte
        s = self._samples(8)
        wav = encode_wav16(s, 8000)
        junk = struct.pack("<4sI", b"LIST", 5) + b"INFOX" + b"\x00"
        wav = wav[:36] + junk + wav[36:]
        wav = wav[:4] + struct.pack("<I", len(wav) - 8) + wav[8:]
        rate, back = decode_wav16(wav)
        assert np.array_equal(back, s)

    def test_unsupported_formats_raise(self):
        import struct

        import pytest

        from stepist_spark.operators.multimodal import decode_wav16, encode_wav16

        wav = encode_wav16(self._samples(), 8000)
        # stereo: patch channels=2 in the fmt body (offset 12+8+2)
        stereo = wav[:22] + struct.pack("<H", 2) + wav[24:]
        for bad in (None, b"", b"RIFX" + wav[4:], stereo, wav[:50]):
            with pytest.raises(ValueError):
                decode_wav16(bad)

    def test_order_checksum_detects_reversal(self):
        from stepist_spark.operators.multimodal import (
            encode_wav16,
            wav_feature_decoder,
        )

        s = self._samples()
        f_ok = wav_feature_decoder(encode_wav16(s, 8000))
        f_rev = wav_feature_decoder(encode_wav16(s[::-1], 8000))
        assert f_ok[2:4] == f_rev[2:4]  # sum/abs-sum are order-blind
        assert f_ok[4] != f_rev[4]      # the weighted sum is not

    def test_through_extract_features(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.multimodal import (
            extract_features,
            synthetic_wav_media,
            wav_feature_decoder,
        )

        ids = spark.range(3).select((F.col("id") + 10).alias("media_id"))
        rows = {
            r["media_id"]: r
            for r in extract_features(
                synthetic_wav_media(ids, n_samples=32, sample_rate=8000),
                decoder=wav_feature_decoder,
            ).collect()
        }
        import numpy as np

        for mid in (10, 11, 12):
            i = np.arange(32, dtype=np.int64)
            s = (mid * 31 + i * 7) % 65536 - 32768
            f = rows[mid]["feature"]
            assert rows[mid]["decode_error"] is None
            assert f[:2] == [8000.0, 32.0]
            assert f[2] == float(s.sum()) and f[4] == float((s * (i + 1)).sum())


class TestPngCodec:
    """The compressed member of the in-repo codec family: stdlib-zlib
    PNG (decode_png / encode_png). The encoder cycles the scanline
    filter type per row, so any roundtrip with h >= 5 exercises every
    decoder filter path (None/Sub/Up/Average/Paeth)."""

    def _rgb(self, w=11, h=6, seed=37, alpha=False):
        import numpy as np

        y, x = np.mgrid[0:h, 0:w]
        chans = [
            (seed * 5 + 2 * x + 7 * y) % 256,
            (seed * 9 + 4 * x + 3 * y) % 256,
            (seed * 17 + x + 6 * y) % 256,
        ]
        if alpha:
            chans.append((seed * 3 + x + y) % 256)
        return np.stack(chans, axis=-1).astype(np.uint8)

    def test_roundtrip_all_filters_rgb(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_png, encode_png

        px = self._rgb(w=11, h=6)  # 6 rows: filters 0,1,2,3,4,0
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_roundtrip_rgba_and_unfiltered(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_png, encode_png

        px = self._rgb(w=5, h=7, alpha=True)
        assert np.array_equal(decode_png(encode_png(px)), px)
        assert np.array_equal(
            decode_png(encode_png(px, cycle_filters=False)), px
        )

    def test_roundtrip_random_and_edge_shapes(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.default_rng(9)
        for (h, w, ch) in [(1, 1, 3), (5, 1, 4), (2, 16, 3), (13, 9, 4)]:
            px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(px)), px), (h, w, ch)

    def test_multi_idat_concatenation(self):
        import struct
        import zlib

        import numpy as np

        from stepist_spark.operators.multimodal import (
            _png_chunk,
            decode_png,
            encode_png,
        )

        px = self._rgb()
        payload = encode_png(px)
        # split the single IDAT into two chunks — legal and common
        pos = 8 + 8 + 13 + 4  # signature + IHDR chunk
        (clen,) = struct.unpack_from(">I", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        rest = payload[pos + 8 + clen + 4 :]
        cut = len(body) // 2
        two = (
            payload[:pos]
            + _png_chunk(b"IDAT", body[:cut])
            + _png_chunk(b"IDAT", body[cut:])
            + rest
        )
        assert np.array_equal(decode_png(two), px)
        # sanity: the split really produced a different byte stream
        assert two != payload and zlib.decompress(body)  # body inflates alone

    def test_ancillary_chunks_skipped_but_crc_checked(self):
        import numpy as np
        import pytest

        from stepist_spark.operators.multimodal import (
            _png_chunk,
            decode_png,
            encode_png,
        )

        px = self._rgb()
        payload = encode_png(px)
        pos = 8 + 8 + 13 + 4
        spliced = (
            payload[:pos] + _png_chunk(b"tEXt", b"Comment\x00hi") + payload[pos:]
        )
        assert np.array_equal(decode_png(spliced), px)
        # corrupt the ancillary chunk's body: CRC must still be enforced
        bad = bytearray(spliced)
        bad[pos + 8] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(bad))

    def test_corrupt_payloads_raise(self):
        import pytest

        from stepist_spark.operators.multimodal import decode_png, encode_png

        payload = encode_png(self._rgb())
        flipped = bytearray(payload)
        flipped[40] ^= 0x01  # inside IDAT: CRC mismatch
        for bad in (None, b"", b"\x89PNG\r\n\x1a\nxx", payload[:30],
                    payload[: len(payload) // 2], bytes(flipped)):
            with pytest.raises(ValueError):
                decode_png(bad)

    def test_unknown_filter_byte_raises(self):
        import struct
        import zlib

        import pytest

        from stepist_spark.operators.multimodal import _png_chunk, decode_png

        # hand-build a 1x1 RGB PNG whose single scanline uses filter 7
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
        stream = bytes([7, 1, 2, 3])
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(stream))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="filter"):
            decode_png(payload)

    def test_geometry_checksum_detects_row_flip(self):
        from stepist_spark.operators.multimodal import (
            encode_png,
            png_feature_decoder,
        )

        px = self._rgb()
        f_ok = png_feature_decoder(encode_png(px))
        f_flip = png_feature_decoder(encode_png(px[::-1]))
        assert f_ok[2:5] == f_flip[2:5]  # channel sums are layout-blind
        assert f_ok[5] != f_flip[5]      # the weighted sum is not

    def test_quarantine_through_extract_features(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.multimodal import (
            extract_features,
            png_feature_decoder,
            synthetic_png_media,
        )

        ids = spark.range(4).select(F.col("id").alias("media_id"))
        media = synthetic_png_media(ids, width=11, height=6)
        # truncate one payload mid-IDAT: the real decode must
        # quarantine THAT row only (round-8 verdict #4's "done" bar)
        poisoned = media.withColumn(
            "payload",
            F.when(
                F.col("media_id") == 2,
                F.substring(F.col("payload"), 1, 60).cast("binary"),
            ).otherwise(F.col("payload")),
        )
        rows = {
            r["media_id"]: r
            for r in extract_features(poisoned, decoder=png_feature_decoder).collect()
        }
        assert rows[2]["feature"] is None and "ValueError" in rows[2]["decode_error"]
        for mid in (0, 1, 3):
            assert rows[mid]["decode_error"] is None
            assert rows[mid]["feature"][0] == 11.0 and rows[mid]["feature"][1] == 6.0

    def test_pil_cross_codec_parity(self):
        import importlib.util

        import pytest

        if importlib.util.find_spec("PIL") is None:
            pytest.skip("PIL not installed — PNG cross-codec check skipped")
        import io

        import numpy as np
        from PIL import Image

        from stepist_spark.operators.multimodal import decode_png, encode_png

        px = self._rgb()
        # our encoder -> PIL decoder
        im = np.array(Image.open(io.BytesIO(encode_png(px))).convert("RGB"))
        assert np.array_equal(im, px)
        # PIL encoder -> our decoder
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="PNG")
        assert np.array_equal(decode_png(buf.getvalue()), px)


class TestJpegCodec:
    """The LOSSY member of the in-repo codec family: baseline
    sequential JPEG (encode_jpeg / decode_jpeg), stdlib+numpy. The
    certification discipline is a quantization-TOLERANCE roundtrip
    against wrap-free gradients (exact equality is impossible for a
    lossy codec); geometry bugs blow the tolerance by construction."""

    def _grad(self, mid=5, w=20, h=14):
        from stepist_spark.operators.multimodal import _jpeg_closed_form

        return _jpeg_closed_form(mid, w, h)

    def _err(self, a, b):
        import numpy as np

        return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())

    def test_roundtrip_444_and_420_within_tolerance(self):
        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            decode_jpeg,
            encode_jpeg,
        )

        src = self._grad()
        for quality, mode in [(94, "444"), (80, "420"), (87, "420")]:
            px = decode_jpeg(encode_jpeg(src, quality=quality, subsampling=mode))
            assert px.shape == src.shape
            assert self._err(px, src) <= _JPEG_TOL

    def test_constant_image_exact(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_jpeg, encode_jpeg

        const = np.full((16, 16, 3), 130, np.uint8)
        assert self._err(decode_jpeg(encode_jpeg(const, quality=90)), const) == 0

    def test_odd_dims_pad_and_crop(self):
        from stepist_spark.operators.multimodal import decode_jpeg, encode_jpeg

        src = self._grad(mid=9, w=9, h=5)  # 4:2:0 pads to 16x16, crops back
        px = decode_jpeg(encode_jpeg(src, quality=90, subsampling="420"))
        assert px.shape == (5, 9, 3)
        assert self._err(px, src) <= 16

    def test_restart_markers_roundtrip(self):
        from stepist_spark.operators.multimodal import decode_jpeg, encode_jpeg

        src = self._grad(mid=4, w=24, h=16)
        payload = encode_jpeg(src, quality=90, subsampling="444", restart_interval=2)
        assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
        assert self._err(decode_jpeg(payload), src) <= 16
        # 420 as well: 24x16 is one MCU row of 2, DRI=1 restarts between
        p2 = encode_jpeg(src, quality=90, subsampling="420", restart_interval=1)
        assert self._err(decode_jpeg(p2), src) <= 16

    def test_gate_parameter_rule_fires_restarts(self):
        # round-10 ADVICE: the m01 'jpg' gate's DRI rule must land on
        # ids whose geometry actually REACHES a restart boundary. The
        # rule is DRI=2 on id%4==1 (odd ⇒ 4:4:4 ⇒ 3×2 = 6 MCUs at the
        # gate's 20×14 dims ⇒ restarts at MCUs 2 and 4) — reproduce the
        # gate's exact parameter derivation and assert RSTn bytes are
        # present in the emitted stream and the roundtrip still passes.
        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            _jpeg_closed_form,
            decode_jpeg,
            encode_jpeg,
        )

        mid = 53  # a real gate id: 53 % 25 == 3 and 53 % 4 == 1
        src = _jpeg_closed_form(mid, 20, 14)
        quality = 80 + (mid % 3) * 7
        mode = "420" if mid % 2 == 0 else "444"
        dri = 2 if mid % 4 == 1 else 0
        assert (mode, dri) == ("444", 2)
        payload = encode_jpeg(src, quality=quality, subsampling=mode, restart_interval=dri)
        # 6 MCUs / DRI=2 ⇒ restarts after MCUs 2 and 4: RST0 then RST1
        assert b"\xff\xd0" in payload and b"\xff\xd1" in payload
        assert self._err(decode_jpeg(payload), src) <= _JPEG_TOL

    def test_geometry_bugs_blow_tolerance(self):
        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            decode_jpeg,
            encode_jpeg,
        )

        src = self._grad()
        px = decode_jpeg(encode_jpeg(src, quality=94))
        assert self._err(px[::-1], src) > _JPEG_TOL  # row flip
        assert self._err(px[:, :, ::-1], src) > _JPEG_TOL  # channel swap

    def test_rejects_malformed(self):
        import pytest

        from stepist_spark.operators.multimodal import decode_jpeg, encode_jpeg

        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"NOPE")
        payload = encode_jpeg(self._grad(), quality=90)
        with pytest.raises(ValueError, match="truncated"):
            decode_jpeg(payload[: len(payload) // 2])
        # flip SOF0 -> SOF2 (progressive): must refuse, not misdecode
        idx = payload.index(b"\xff\xc0")
        prog = payload[:idx] + b"\xff\xc2" + payload[idx + 2 :]
        with pytest.raises(ValueError, match="not baseline"):
            decode_jpeg(prog)

    def test_corrupt_payload_quarantines_through_seam(self, spark):
        from stepist_spark.operators.multimodal import (
            encode_jpeg,
            extract_features,
            jpeg_feature_decoder,
        )

        good = encode_jpeg(self._grad(), quality=90)
        media = spark.createDataFrame(
            [
                (1, "image", "image/jpeg", bytearray(good)),
                (2, "image", "image/jpeg", bytearray(good[:40])),
            ],
            "media_id long, kind string, mime string, payload binary",
        )
        out = {
            r["media_id"]: r
            for r in extract_features(media, decoder=jpeg_feature_decoder).collect()
        }
        assert out[1]["decode_error"] is None
        assert out[1]["feature"][:2] == [20.0, 14.0]
        assert out[2]["decode_error"] is not None and out[2]["feature"] is None

    def test_roundtrip_gate_op(self, spark):
        from stepist_spark.operators.multimodal import jpeg_roundtrip_features

        ids = spark.createDataFrame([(i,) for i in range(8)], "media_id long")
        rows = {r["media_id"]: r for r in
                jpeg_roundtrip_features(ids, width=20, height=14).collect()}
        assert len(rows) == 8
        for mid, r in rows.items():
            assert (r["width"], r["height"], r["n_px"], r["ok"]) == (20, 14, 280, 1)
            assert r["mode"] == ("420" if mid % 2 == 0 else "444")
            assert r["quality"] == 80 + (mid % 3) * 7


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="PIL not installed in this environment",
)
class TestJpegPilCross:
    """Cross-codec checks wherever PIL exists: our encode must decode
    under PIL within the same tolerance, and a PIL-encoded baseline
    JPEG must decode under our decoder."""

    def test_pil_decodes_our_encode(self):
        import io

        import numpy as np
        from PIL import Image

        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            _jpeg_closed_form,
            encode_jpeg,
        )

        src = _jpeg_closed_form(5, 20, 14)
        for mode in ("444", "420"):
            payload = encode_jpeg(src, quality=90, subsampling=mode)
            px = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
            assert px.shape == src.shape
            assert int(np.abs(px.astype(np.int64) - src.astype(np.int64)).max()) <= _JPEG_TOL

    def test_our_decoder_reads_pil_encode(self):
        import io

        import numpy as np
        from PIL import Image

        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            _jpeg_closed_form,
            decode_jpeg,
        )

        src = _jpeg_closed_form(7, 20, 14)
        buf = io.BytesIO()
        Image.fromarray(src).save(buf, format="JPEG", quality=92)
        px = decode_jpeg(buf.getvalue())
        assert px.shape == src.shape
        assert int(np.abs(px.astype(np.int64) - src.astype(np.int64)).max()) <= _JPEG_TOL


class TestAviMjpegCodec:
    """The VIDEO member of the in-repo codec family (round-11 verdict
    #3): MJPEG-in-AVI — the RIFF chunk walk (WAV discipline) carrying
    one baseline JPEG per '00dc' frame. Certification = per-frame
    quantization tolerance against each frame's OWN closed form; the
    40/frame base step makes any reorder blow the tolerance."""

    def _stack(self, mid=7, w=20, h=14, n=3):
        import numpy as np

        from stepist_spark.operators.multimodal import _avi_closed_form

        return np.stack([_avi_closed_form(mid, f, w, h) for f in range(n)])

    def _err(self, a, b):
        import numpy as np

        return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())

    def test_roundtrip_within_tolerance_both_chromas(self):
        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        src = self._stack()
        for mode in ("444", "420"):
            fps, px = decode_avi_mjpeg(
                encode_avi_mjpeg(src, fps=7, quality=90, subsampling=mode)
            )
            assert fps == 7 and px.shape == src.shape
            assert self._err(px, src) <= _JPEG_TOL

    def test_frame_order_certified_by_value(self):
        # any permutation of decoded frames scores >= 40 - quantization
        # against the per-index closed forms — order is IN the gate
        import itertools

        from stepist_spark.operators.multimodal import (
            _JPEG_TOL,
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        src = self._stack()
        _, px = decode_avi_mjpeg(encode_avi_mjpeg(src, fps=5, quality=94))
        for perm in itertools.permutations(range(3)):
            err = self._err(px[list(perm)], src)
            if perm == (0, 1, 2):
                assert err <= _JPEG_TOL
            else:
                assert err > _JPEG_TOL, perm

    def test_restart_markers_inside_frames(self):
        from stepist_spark.operators.multimodal import encode_avi_mjpeg

        src = self._stack()
        payload = encode_avi_mjpeg(
            src, fps=5, quality=90, subsampling="444", restart_interval=2
        )
        assert b"\xff\xd0" in payload

    def test_idx1_entries_point_at_frames(self):
        import struct

        from stepist_spark.operators.multimodal import encode_avi_mjpeg

        src = self._stack(n=3)
        data = encode_avi_mjpeg(src, fps=5)
        # find movi list and idx1 chunk
        movi_at = data.find(b"movi")
        idx_at = data.find(b"idx1")
        assert movi_at > 0 and idx_at > movi_at
        (ilen,) = struct.unpack_from("<I", data, idx_at + 4)
        assert ilen == 16 * 3
        for i in range(3):
            cid, flags, off, size = struct.unpack_from(
                "<4sIII", data, idx_at + 8 + 16 * i
            )
            assert cid == b"00dc" and flags == 0x10
            # offset is relative to the 'movi' fourcc
            hdr = movi_at + off
            assert data[hdr : hdr + 4] == b"00dc"
            (clen,) = struct.unpack_from("<I", data, hdr + 4)
            assert clen == size
            assert data[hdr + 8 : hdr + 10] == b"\xff\xd8"  # SOI of that frame

    def test_chunk_walk_skips_junk(self):
        import struct

        from stepist_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        src = self._stack()
        data = bytearray(encode_avi_mjpeg(src, fps=5))
        junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
        movi_at = data.find(b"LIST", 12)
        # insert before the FIRST LIST (hdrl) and fix the RIFF size
        data[12:12] = junk
        struct.pack_into("<I", data, 4, struct.unpack_from("<I", data, 4)[0] + len(junk))
        fps, px = decode_avi_mjpeg(bytes(data))
        assert fps == 5 and px.shape == src.shape and movi_at > 0

    def test_quarantine_errors(self):
        import struct

        import pytest as _pytest

        from stepist_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        src = self._stack()
        good = encode_avi_mjpeg(src, fps=5)
        with _pytest.raises(ValueError, match="too short"):
            decode_avi_mjpeg(good[:8])
        with _pytest.raises(ValueError, match="magic"):
            decode_avi_mjpeg(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
        # non-MJPG handler: patch the strh fccHandler
        bad = bytearray(good)
        at = bad.find(b"vidsMJPG")
        bad[at + 4 : at + 8] = b"H264"
        with _pytest.raises(ValueError, match="handler"):
            decode_avi_mjpeg(bytes(bad))
        # header/movi frame-count contradiction: bump avih dwTotalFrames
        bad = bytearray(good)
        avih_at = bad.find(b"avih")
        struct.pack_into("<I", bad, avih_at + 8 + 16, 5)
        with _pytest.raises(ValueError, match="declares 5 frames"):
            decode_avi_mjpeg(bytes(bad))
        # truncated movi chunk
        with _pytest.raises(ValueError, match="truncated|frames"):
            decode_avi_mjpeg(good[: len(good) // 2])

    def test_encoder_input_validation(self):
        import numpy as np
        import pytest as _pytest

        from stepist_spark.operators.multimodal import encode_avi_mjpeg

        with _pytest.raises(ValueError, match=r"\(n, h, w, 3\)"):
            encode_avi_mjpeg(np.zeros((4, 4, 3), dtype=np.uint8))
        with _pytest.raises(ValueError, match="fps"):
            encode_avi_mjpeg(np.zeros((1, 8, 8, 3), dtype=np.uint8), fps=0)

    def test_gate_op_shape_and_ok(self, spark):
        from stepist_spark.operators.multimodal import avi_roundtrip_features

        ids = spark.createDataFrame(
            [(7,), (56,), (105,), (154,)], "media_id long"
        )
        rows = {
            r["media_id"]: r
            for r in avi_roundtrip_features(ids, width=20, height=14).collect()
        }
        assert len(rows) == 4
        for mid, r in rows.items():
            assert (r["width"], r["height"], r["n_frames"], r["ok"]) == (20, 14, 3, 1)
            assert r["quality"] == 80 + (mid % 3) * 7
            assert r["mode"] == ("420" if mid % 2 == 0 else "444")
            assert r["fps"] == 5 + (mid % 5)
        # the four ids exercise both chroma modes and distinct fps
        assert {r["mode"] for r in rows.values()} == {"420", "444"}
        assert len({r["fps"] for r in rows.values()}) >= 3


class TestGifCodec:
    """The PALETTE-INDEXED member of the codec family (round 11):
    GIF89a with a real variable-width LZW coder. Lossless on the index
    raster, so every check is EXACT; covers the three decode paths no
    other codec exercises — LZW table growth + CLEAR reset, the 4-pass
    interlace shuffle, and multi-image (animated) block sequences."""

    def _pal(self, depth, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(1 << depth, 3)).astype(np.uint8)

    def test_roundtrip_matrix(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_gif, encode_gif

        rng = np.random.default_rng(11)
        for nf in (1, 3):
            for inter in (False, True):
                for depth in (2, 4, 8):
                    frames = [
                        rng.integers(0, 1 << depth, size=(9, 17)).astype(np.uint8)
                        for _ in range(nf)
                    ]
                    pal = self._pal(depth)
                    p = encode_gif(frames, pal, delay_cs=7, interlace=inter)
                    df, dpal, dd, di = decode_gif(p)
                    assert len(df) == nf and dd == 7 and di == inter
                    assert np.array_equal(dpal, pal)
                    for a, b in zip(df, frames):
                        assert np.array_equal(a, b)

    def test_lzw_growth_and_clear_reset(self):
        # 128x128 random bytes force the code table through every
        # width 9..12 AND past 4096 entries (the mid-stream CLEAR
        # reset); exact roundtrip proves encoder/decoder width rules
        # stay in sync through both transitions
        import numpy as np

        from stepist_spark.operators.multimodal import (
            _gif_lzw_decode,
            _gif_lzw_encode,
        )

        rng = np.random.default_rng(3)
        idx = rng.integers(0, 256, size=128 * 128).astype(np.uint8)
        enc = _gif_lzw_encode(idx, 8)
        assert _gif_lzw_decode(enc, 8, idx.size) == list(idx)
        # compressible input (long runs) exercises multi-symbol entries
        runs = np.repeat(np.arange(16, dtype=np.uint8), 200)
        enc2 = _gif_lzw_encode(runs, 4)
        assert len(enc2) < runs.size // 4  # actually compresses
        assert _gif_lzw_decode(enc2, 4, runs.size) == list(runs)

    def test_interlace_is_really_deinterlaced(self):
        # the interlaced payload stores rows in pass order — decoding
        # it as if sequential would scramble geometry; equality of the
        # full raster proves the de-interlace map is applied
        import numpy as np

        from stepist_spark.operators.multimodal import (
            _gif_interlace_rows,
            decode_gif,
            encode_gif,
        )

        assert _gif_interlace_rows(9) == [0, 8, 4, 2, 6, 1, 3, 5, 7]
        frame = np.arange(9 * 17, dtype=np.uint8).reshape(9, 17) % 256
        p_seq = encode_gif([frame], self._pal(8), interlace=False)
        p_int = encode_gif([frame], self._pal(8), interlace=True)
        assert p_seq != p_int  # the stored row order genuinely differs
        assert np.array_equal(decode_gif(p_int)[0][0], frame)

    def test_frame_order_certified(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_gif, encode_gif

        frames = [
            np.full((4, 5), 10 * f, dtype=np.uint8) for f in range(3)
        ]
        p = encode_gif(frames, self._pal(8))
        got = decode_gif(p)[0]
        assert [int(f[0, 0]) for f in got] == [0, 10, 20]  # stream order kept

    def test_unknown_extension_skipped(self):
        import numpy as np

        from stepist_spark.operators.multimodal import decode_gif, encode_gif

        frame = np.arange(20, dtype=np.uint8).reshape(4, 5)
        good = encode_gif([frame], self._pal(8))
        hdr = 13 + 3 * 256
        spliced = good[:hdr] + b"\x21\xfehello\x00"[:2] + b"\x05hello\x00" + good[hdr:]
        assert np.array_equal(decode_gif(spliced)[0][0], frame)

    def test_quarantine_errors(self):
        import numpy as np
        import pytest

        from stepist_spark.operators.multimodal import decode_gif, encode_gif

        frame = np.arange(20, dtype=np.uint8).reshape(4, 5)
        good = encode_gif([frame], self._pal(8))
        with pytest.raises(ValueError, match="magic"):
            decode_gif(b"NOTG" + good[4:])
        with pytest.raises(ValueError, match="trailer"):
            decode_gif(good[:-1])
        with pytest.raises(ValueError, match="truncated"):
            decode_gif(good[:40])
        bad = bytearray(good)
        bad[10] &= 0x7F  # clear the GCT flag
        with pytest.raises(ValueError, match="global color table"):
            decode_gif(bytes(bad))
        # a corrupt LZW byte must be a *named* error, not garbage output
        lzw_pos = len(good) - 10
        bad2 = bytearray(good)
        bad2[lzw_pos] ^= 0xFF
        with pytest.raises(ValueError):
            decode_gif(bytes(bad2))

    def test_encoder_validation(self):
        import numpy as np
        import pytest

        from stepist_spark.operators.multimodal import encode_gif

        with pytest.raises(ValueError, match="at least one"):
            encode_gif([], self._pal(8))
        with pytest.raises(ValueError, match="power of two"):
            encode_gif([np.zeros((2, 2), np.uint8)], np.zeros((5, 3), np.uint8))
        with pytest.raises(ValueError, match="one size"):
            encode_gif(
                [np.zeros((2, 2), np.uint8), np.zeros((3, 2), np.uint8)],
                self._pal(8),
            )
        with pytest.raises(ValueError, match="exceeds palette"):
            encode_gif([np.full((2, 2), 20, np.uint8)], self._pal(4))

    def test_gate_op_parameter_cycling(self, spark):
        from pyspark.sql import Row

        from stepist_spark.operators.multimodal import gif_roundtrip_features

        # ids stepping by 49 from residue 11 — the gate's exact rule
        ids = spark.createDataFrame(
            [Row(media_id=11 + 49 * i) for i in range(6)]
        )
        rows = {r["media_id"]: r for r in gif_roundtrip_features(ids, 17, 9).collect()}
        assert all(r["ok"] == 1 for r in rows.values())
        assert {r["depth"] for r in rows.values()} == {4, 8}
        assert {r["interlaced"] for r in rows.values()} == {0, 1}
        assert {r["n_frames"] for r in rows.values()} == {1, 3}
        assert len({r["delay_cs"] for r in rows.values()}) >= 3
        for mid, r in rows.items():
            assert r["depth"] == (4 if mid % 3 == 0 else 8)
            assert r["interlaced"] == mid % 2
            assert r["n_frames"] == (3 if mid % 5 == 0 else 1)


class TestImaAdpcmCodec:
    """The COMPRESSED-AUDIO member of the codec family (round 11):
    IMA ADPCM in WAV (tag 0x0011). Lossy 4:1, so certification =
    tolerance tracking of a bounded-slope closed form + exact
    length/rate/geometry; corruption scope is measured and documented
    at _IMA_TOL (low-step nibble flips can hide — unlike JPEG)."""

    def _tri(self, mid, n=600):
        import numpy as np

        i = np.arange(n, dtype=np.int64)
        c = 64 + 32 * (mid % 3)
        period = 64 + 32 * (mid % 5)
        return (c * (np.abs((i + mid) % period - period // 2) - period // 4)).astype(
            np.int16
        )

    def test_roundtrip_tracks_within_tol(self):
        import numpy as np

        from stepist_spark.operators.multimodal import (
            _IMA_TOL,
            decode_wav_ima,
            encode_wav_ima,
        )

        for mid in (11, 60, 109, 158, 207):
            src = self._tri(mid)
            align = 132 if mid % 2 == 0 else 260
            rate = 8000 + 100 * (mid % 6)
            dec, drate = decode_wav_ima(encode_wav_ima(src, rate, block_align=align))
            assert drate == rate and dec.size == src.size
            err = int(np.abs(dec.astype(np.int64) - src.astype(np.int64)).max())
            assert err <= _IMA_TOL, (mid, err)

    def test_partial_final_block_length_exact(self):
        import numpy as np

        from stepist_spark.operators.multimodal import (
            decode_wav_ima,
            encode_wav_ima,
        )

        # 600 samples at spb=257 -> blocks of 257+257+86: the fact
        # chunk must clip the padded tail exactly
        src = self._tri(11)
        payload = encode_wav_ima(src, 8000, block_align=132)
        dec, _ = decode_wav_ima(payload)
        assert dec.size == 600
        # a single full block roundtrips too (no partial path)
        one = self._tri(4)[:257]
        dec1, _ = decode_wav_ima(encode_wav_ima(one, 8000, block_align=132))
        assert dec1.size == 257

    def test_detected_corruption_class(self):
        import numpy as np

        from stepist_spark.operators.multimodal import (
            _IMA_TOL,
            decode_wav_ima,
            encode_wav_ima,
        )

        src = self._tri(11)
        p = bytearray(encode_wav_ima(src, 8000, block_align=260))
        p[p.find(b"data") + 8 + 50] ^= 0xFF  # early-block flip: desyncs
        dec, _ = decode_wav_ima(bytes(p))
        err = int(np.abs(dec.astype(np.int64) - src.astype(np.int64)).max())
        assert err > _IMA_TOL

    def test_unknown_chunk_skipped(self):
        import numpy as np

        from stepist_spark.operators.multimodal import (
            decode_wav_ima,
            encode_wav_ima,
        )

        src = self._tri(60)
        good = encode_wav_ima(src, 8000, block_align=132)
        # splice a LIST chunk between fmt and fact (the WAV discipline)
        fmt_end = good.find(b"fact")
        spliced = good[:fmt_end] + b"LIST\x04\x00\x00\x00INFO" + good[fmt_end:]
        dec, _ = decode_wav_ima(spliced)
        ref, _ = decode_wav_ima(good)
        assert np.array_equal(dec, ref)

    def test_quarantine_errors(self):
        import struct

        import pytest

        from stepist_spark.operators.multimodal import (
            decode_wav_ima,
            encode_wav_ima,
        )

        good = encode_wav_ima(self._tri(11), 8000, block_align=132)
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav_ima(b"XXXX" + good[4:])
        with pytest.raises(ValueError, match="truncated"):
            decode_wav_ima(good[:60])
        # PCM tag must be rejected (this is the IMA decoder)
        bad = bytearray(good)
        off = bad.find(b"fmt ") + 8
        struct.pack_into("<H", bad, off, 0x0001)
        with pytest.raises(ValueError, match="unsupported WAV"):
            decode_wav_ima(bytes(bad))
        # inconsistent samples_per_block vs block_align
        bad2 = bytearray(good)
        struct.pack_into("<H", bad2, off + 18, 999)
        with pytest.raises(ValueError, match="inconsistent IMA geometry"):
            decode_wav_ima(bytes(bad2))
        # missing fact: excise it (4 id + 4 len + 4 count = 12 bytes)
        f = good.find(b"fact")
        nofact = good[:f] + good[f + 12 :]
        with pytest.raises(ValueError, match="fact"):
            decode_wav_ima(nofact)
        # bad step index in a block header
        bad3 = bytearray(good)
        bad3[bad3.find(b"data") + 8 + 2] = 99
        with pytest.raises(ValueError, match="step index"):
            decode_wav_ima(bytes(bad3))

    def test_encoder_validation(self):
        import numpy as np
        import pytest

        from stepist_spark.operators.multimodal import encode_wav_ima

        with pytest.raises(ValueError, match="non-empty"):
            encode_wav_ima(np.array([], dtype=np.int16), 8000)
        with pytest.raises(ValueError, match="multiple of 4"):
            encode_wav_ima(np.zeros(10, np.int16), 8000, block_align=130)

    def test_gate_op_parameter_cycling(self, spark):
        from pyspark.sql import Row

        from stepist_spark.operators.multimodal import ima_roundtrip_features

        ids = spark.createDataFrame(
            [Row(media_id=17 + 49 * i) for i in range(6)]
        )
        rows = {r["media_id"]: r for r in ima_roundtrip_features(ids).collect()}
        assert all(r["ok"] == 1 for r in rows.values())
        assert {r["block_align"] for r in rows.values()} == {132, 260}
        assert {r["n_blocks"] for r in rows.values()} == {2, 3}
        assert len({r["sample_rate"] for r in rows.values()}) >= 3
        for mid, r in rows.items():
            assert r["block_align"] == (132 if mid % 2 == 0 else 260)
            assert r["sample_rate"] == 8000 + 100 * (mid % 6)
