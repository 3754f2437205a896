"""Full PNG pixel decode (stdlib zlib + numpy defilter) — round-trips
through the independent ``encode_png`` fixture writer, every filter
type, every supported color type, and the Spark ``pixel_stats``
operator."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_engineering_project_capstone_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_png,
    pixel_stats,
    png_pixels,
)

RNG = np.random.default_rng(7)


def _random_px(h, w, ch):
    return RNG.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_color_types_filter0(ch):
    px = _random_px(5, 7, ch)
    assert np.array_equal(png_pixels(encode_png(px)), px)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(f):
    px = _random_px(6, 9, 3)
    out = png_pixels(encode_png(px, filters=[f] * 6))
    assert np.array_equal(out, px), f"filter {f} defilter broken"


def test_roundtrip_mixed_filters():
    px = _random_px(10, 8, 4)
    out = png_pixels(encode_png(px, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
    assert np.array_equal(out, px)


def test_palette_png_expands():
    # hand-build a color-type-3 PNG: 2x2, palette of 3 colors
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([0, 0, 1, 0, 2, 2])  # two scanlines: filter0 + 2 indexes

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(idx))
        + chunk(b"IEND", b"")
    )
    px = png_pixels(payload)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 1].tolist() == [0, 0, 255]


def test_unsupported_variants_raise_loudly():
    px = _random_px(2, 2, 3)
    good = bytearray(encode_png(px))
    # bit depth 16
    deep = bytearray(good)
    deep[24] = 16
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_pixels(bytes(deep))
    # Adam7 interlace flag
    inter = bytearray(good)
    inter[28] = 1
    with pytest.raises(NotImplementedError, match="interlaced"):
        png_pixels(bytes(inter))
    with pytest.raises(ValueError, match="not a PNG"):
        png_pixels(b"BM" + bytes(20))


def test_pixel_stats_operator_exact(spark):
    imgs = [_random_px(4, 6, 3), _random_px(3, 3, 1), _random_px(2, 5, 4)]
    rows = [
        (i, "image", bytearray(encode_png(px, filters=[i % 5] * px.shape[0])), {})
        for i, px in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in pixel_stats(df).collect()}
    assert set(got) == {0, 1, 2}
    for i, px in enumerate(imgs):
        r = got[i]
        h, w, c = px.shape
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["mean_pixel"] == int(px.sum(dtype="int64")) / (h * w * c)
        assert (r["min_pixel"], r["max_pixel"]) == (int(px.min()), int(px.max()))
        assert r["pixel_crc32"] == zlib.crc32(px.tobytes()) & 0xFFFFFFFF
