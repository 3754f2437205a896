"""BMP + GIF full pixel decode (round-7): round-trips through the
independent fixture writers, the real-LZW and clear-every-code stream
variants, width-growth and 4096-cap LZW paths, loud failures on the
documented restrictions, and cross-container crc parity with PNG."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from data_engineering_project_capstone_spark.operators.multimodal import (
    _lzw_decode,
    _lzw_encode,
    bmp_pixels,
    decode_pixels,
    encode_bmp,
    encode_gif,
    encode_png,
    gif_pixels,
    parity_fixture,
    pixel_stats,
)

RNG = np.random.default_rng(11)


def _palette_img(h, w, ncol, rng=RNG):
    pal = np.unique(
        rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8), axis=0
    )
    return pal[rng.integers(0, len(pal), size=(h, w))]


@pytest.mark.parametrize("h,w", [(1, 1), (3, 7), (13, 5), (2, 40)])
def test_bmp_roundtrip_incl_row_padding(h, w):
    # non-multiple-of-4 strides exercise the padding logic
    px = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(bmp_pixels(encode_bmp(px)), px)


def test_bmp_unsupported_raises():
    px = RNG.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(px))
    payload[28] = 8  # bit depth
    with pytest.raises(NotImplementedError, match="bit depth"):
        bmp_pixels(bytes(payload))
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_pixels(b"GIF89a" + bytes(20))


@pytest.mark.parametrize("clear_every", [False, True])
@pytest.mark.parametrize("h,w,ncol", [(4, 5, 3), (16, 16, 40), (30, 30, 256)])
def test_gif_roundtrip(h, w, ncol, clear_every):
    px = _palette_img(h, w, ncol)
    assert np.array_equal(
        gif_pixels(encode_gif(px, clear_every=clear_every)), px
    )


def test_lzw_width_growth_and_cap():
    rng = np.random.default_rng(5)
    # crosses several width boundaries
    seq = [int(x) for x in rng.integers(0, 4, size=5000)]
    assert _lzw_decode(2, _lzw_encode(seq, 2, False)) == seq
    # KwKwK-heavy repetitive stream
    rep = [0] * 3000 + [1, 0] * 500
    assert _lzw_decode(2, _lzw_encode(rep, 2, False)) == rep
    # long enough that the 4096-entry table cap engages
    big = [int(x) for x in rng.integers(0, 2, size=120000)]
    assert _lzw_decode(2, _lzw_encode(big, 2, False)) == big


def test_gif_interlace_raises():
    px = _palette_img(4, 4, 4)
    payload = bytearray(encode_gif(px))
    sep = payload.index(0x2C)
    payload[sep + 9] |= 0x40  # interlace flag
    with pytest.raises(NotImplementedError, match="interlaced"):
        gif_pixels(bytes(payload))


def test_cross_container_crc_parity_local():
    px = _palette_img(9, 11, 30)
    crcs = {
        zlib.crc32(decode_pixels(enc).tobytes()) & 0xFFFFFFFF
        for enc in (
            encode_png(px, filters=[3] * 9),
            encode_bmp(px),
            encode_gif(px),
            encode_gif(px, clear_every=True),
        )
    }
    assert len(crcs) == 1


def test_parity_fixture_pixel_stats_spark(spark):
    rows = pixel_stats(parity_fixture(spark)).collect()
    assert len(rows) == 36  # 12 images x 3 containers
    by_img = {}
    for r in rows:
        by_img.setdefault(r["media_id"], set()).add(
            (r["pixel_crc32"], r["width"], r["height"], r["channels"])
        )
    assert all(len(v) == 1 for v in by_img.values())


def test_lzw_decodes_stream_without_leading_clear():
    # Spec-legal: encoders only *should* lead with CLEAR (GIF89a app. F);
    # giflib/PIL decode literal-first streams, so we must too.
    # Codes 1@3, 2@3, 1@3 grow the table to 8 entries (width bump), then
    # END(5)@4 — packed LSB-first by hand since our encoder always CLEARs.
    big = 1 | (2 << 3) | (1 << 6) | (5 << 9)
    assert _lzw_decode(2, big.to_bytes(2, "little")) == [1, 2, 1]


def test_lzw_invalid_first_code_raises_valueerror():
    # first code beyond the root table (and != next_code) must be the
    # documented loud failure, not a bare KeyError
    with pytest.raises(ValueError, match="out of range"):
        _lzw_decode(2, b"\x07")


def test_zero_area_image_raises_valueerror():
    # a syntactically valid header declaring width/height 0 must hit the
    # corrupt-payload contract, not a ZeroDivisionError inside pixel_stats
    with pytest.raises(ValueError, match="zero-area"):
        decode_pixels(encode_bmp(np.zeros((0, 0, 3), dtype=np.uint8)))
