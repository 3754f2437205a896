"""Multimodal plumbing: binary payloads through mapInPandas stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    media_fixture,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    return media_fixture(spark).cache()


def test_decode_media(spark, media):
    out = decode_media(media).collect()
    assert len(out) == media.count()
    for r in out:
        assert 64 <= r["width"] < 4096 and 64 <= r["height"] < 4096
        assert r["payload_bytes"] >= 26  # header + min body
        if r["kind"] == "image":
            assert r["n_frames"] == 1


def test_decode_rejects_foreign_format(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"JPEGnotreally"), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="NotImplementedError|MM01|decoding"):
        decode_media(df).collect()


def test_extract_features_deterministic(spark, media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    # the documented default dim=16 (a single sha256 digest is only 8
    # floats — the featurizer extends the hash stream to honor dim)
    assert all(len(v) == 16 and all(0 <= x <= 1 for x in v) for v in a.values())


def test_frame_sample(spark, media):
    out = {r["media_id"]: r["frame_indices"] for r in frame_sample(media, 10).collect()}
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    decoded = {r["media_id"]: r["n_frames"] for r in decode_media(media).collect()}
    assert out and all(kinds[m] == "video" for m in out)
    for m, idx in out.items():
        assert idx[0] == 0 and all(b - a == 10 for a, b in zip(idx, idx[1:]))
        assert idx[-1] <= decoded[m] - 1


def test_resize_plan(spark, media):
    for r in resize_plan(media, 256).collect():
        assert max(r["target_width"], r["target_height"]) <= 256
        # aspect preserved within integer floor tolerance
        if r["width"] >= r["height"]:
            assert r["target_width"] >= r["target_height"]
        else:
            assert r["target_height"] >= r["target_width"]


# ---------------------------------------------------------------------------
# Real container formats (round 6): PNG/GIF/BMP/JPEG headers + genuine WAV
# decode via stdlib `wave` — no third-party codec libraries involved.
# ---------------------------------------------------------------------------


def _png(w: int, h: int) -> bytes:
    """A fully valid RGBA PNG (correct CRCs, real zlib IDAT)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f\x00\xff\xff" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif(w: int, h: int, frames: int) -> bytes:
    """Structurally valid GIF89a with `frames` image descriptors."""
    import struct

    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])
    for _ in range(frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02" + bytes([2, 0x4C, 0x01]) + b"\x00"  # LZW sub-block
    return out + b"\x3b"


def _bmp(w: int, h: int) -> bytes:
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info


def _jpeg(w: int, h: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + dqt + sof0


def _wav(rate: int, channels: int, frames: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x01" * channels * frames)
    return buf.getvalue()


def test_decode_payload_real_formats():
    from data_engineering_project_capstone_spark.operators.multimodal import (
        decode_payload,
    )

    assert decode_payload(_png(320, 200)) == (320, 200, 1)
    assert decode_payload(_gif(64, 48, 3)) == (64, 48, 3)
    assert decode_payload(_bmp(800, 600)) == (800, 600, 1)  # top-down abs(h)
    assert decode_payload(_jpeg(1024, 768)) == (1024, 768, 1)
    assert decode_payload(_wav(8000, 2, 1234)) == (8000, 2, 1234)


def test_decode_media_mixed_real_containers(spark):
    """decode_media handles a DataFrame mixing all real container formats
    plus the MM01 fixture format — the production contract."""
    from data_engineering_project_capstone_spark.operators.multimodal import (
        encode_fake_media,
    )

    rows = [
        (1, "image", bytearray(_png(12, 34)), {"fmt": "png"}),
        (2, "image", bytearray(_gif(56, 78, 2)), {"fmt": "gif"}),
        (3, "image", bytearray(_bmp(90, 12)), {"fmt": "bmp"}),
        (4, "image", bytearray(_jpeg(34, 56)), {"fmt": "jpeg"}),
        (5, "audio", bytearray(_wav(44100, 1, 999)), {"fmt": "wav"}),
        (6, "video", bytearray(encode_fake_media(7, 8, 240, b"x" * 32)), {"fmt": "mm01"}),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    got = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
           for r in decode_media(df).collect()}
    assert got == {
        1: (12, 34, 1),
        2: (56, 78, 2),
        3: (90, 12, 1),
        4: (34, 56, 1),
        5: (44100, 1, 999),
        6: (7, 8, 240),
    }


def test_decode_payload_corrupt_raises():
    import pytest as _pytest

    from data_engineering_project_capstone_spark.operators.multimodal import (
        decode_payload,
    )

    with _pytest.raises(ValueError):
        decode_payload(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + b"XXXX" + b"\x00" * 8)
    with _pytest.raises(ValueError):
        decode_payload(b"\xff\xd8\xff\xda\x00\x02")  # scan before SOF
    with _pytest.raises(NotImplementedError):
        decode_payload(b"RIFX....AVI LIST")  # unknown container


def test_jpeg_pixel_decode_boundary_is_pinned():
    """PINNED DECISION (round 8, SURVEY §2.11): JPEG ENTROPY decode is
    the one deliberate third-party boundary in the media stack. A valid
    JPEG still header-decodes (dims/channels via the SOF marker walk),
    but decode_pixels must refuse it LOUDLY — with the message that
    names the PIL/libjpeg contract — rather than guess. If someone
    later wires a real JPEG pixel path, this test forces them to also
    extend check_pixel_parity to the fourth container."""
    import pytest as _pytest

    from data_engineering_project_capstone_spark.operators.multimodal import (
        decode_payload,
        decode_pixels,
    )

    jpg = _jpeg(34, 56)
    assert decode_payload(jpg) == (34, 56, 1)  # header walk: supported
    with _pytest.raises(NotImplementedError, match="JPEG entropy decode"):
        decode_pixels(jpg)
