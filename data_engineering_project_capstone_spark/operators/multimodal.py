"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for a 100 TB media pipeline (north-star extension):

- Media rows are ``(media_id, kind, payload: binary, meta: map<string,string>)``.
  The payload never leaves the executor; Python touches it only inside
  Arrow-batched ``mapInPandas`` operators.
- Decode / feature-extract / resize / frame-sample are ``mapInPandas``
  stages: per-partition batch iterators, so batch size (not row count)
  bounds memory, and the operators compose into one narrow pipeline stage —
  no shuffle between media ops.
- ``decode_payload`` handles REAL public container formats with no
  third-party libraries: PNG (IHDR), GIF87a/89a, BMP (BITMAPINFOHEADER),
  JPEG (marker-segment walk to SOF), and WAV (stdlib ``wave`` — a genuine
  decode, not just header sniffing). The MM01 fixture format remains for
  deterministic tests. PNG, BMP, and GIF payloads additionally get
  FULL pixel decompression (``decode_pixels``/``pixel_stats``): PNG
  via stdlib zlib inflate + numpy defilter of all five filter types
  with palette expansion; BMP as 24-bit BI_RGB with stride padding;
  GIF through a REAL LZW codec (variable-width LSB-first codes,
  KwKwK, 4096-entry cap, CLEAR handling) — no PIL required anywhere;
  JPEG entropy decode remains the genuine PIL/libjpeg boundary, gated
  behind the same loud ``bytes -> pixels`` contract.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

# Fake container format for fixtures: b"MM01" + u16 width + u16 height +
# u16 n_frames + opaque body. Real decoders replace _decode_stub only.
_MAGIC = b"MM01"


def encode_fake_media(width: int, height: int, n_frames: int, body: bytes) -> bytes:
    """Build a payload in the fixture container format."""
    return _MAGIC + _struct.pack("<HHH", width, height, n_frames) + body


def _decode_mm01(payload: bytes) -> tuple[int, int, int]:
    """Fixture-format decoder (deterministic test container)."""
    w, h, n = _struct.unpack("<HHH", payload[4:10])
    return w, h, n


def _decode_png(payload: bytes) -> tuple[int, int, int]:
    """PNG: the IHDR chunk is REQUIRED to be first (PNG spec §11.2.2),
    so width/height are big-endian u32 at bytes 16..24."""
    if len(payload) < 24 or payload[12:16] != b"IHDR":
        raise ValueError("corrupt PNG: missing IHDR")
    w, h = _struct.unpack(">II", payload[16:24])
    return w, h, 1


def _decode_gif(payload: bytes) -> tuple[int, int, int]:
    """GIF87a/89a: logical-screen width/height, little-endian u16 at 6..10;
    frame count = number of image-separator blocks (0x2C) found by a
    block-structure walk (correct for well-formed files — 0x2C bytes
    inside compressed data are skipped, not counted)."""
    if len(payload) < 10:
        raise ValueError("corrupt GIF: truncated header")
    w, h = _struct.unpack("<HH", payload[6:10])
    # walk: [global color table] then blocks: 0x21 ext (sub-blocks),
    # 0x2C image descriptor (+ LCT + LZW sub-blocks), 0x3B trailer
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table present
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    try:
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                frames += 1
                lct = payload[pos + 9]
                pos += 10
                if lct & 0x80:
                    pos += 3 * (2 << (lct & 0x07))
                pos += 1  # LZW min code size
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            else:
                raise ValueError(f"corrupt GIF: unknown block 0x{b0:02x}")
    except IndexError as e:
        raise ValueError("corrupt GIF: truncated block") from e
    return w, h, max(frames, 1)


def _decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """BMP: BITMAPINFOHEADER width (i32) at 18, height (i32, sign =
    row order) at 22."""
    if len(payload) < 26:
        raise ValueError("corrupt BMP: truncated header")
    w, h = _struct.unpack("<ii", payload[18:26])
    return w, abs(h), 1


def _decode_jpeg(payload: bytes) -> tuple[int, int, int]:
    """JPEG: walk marker segments from SOI to the first SOF0-SOF15 frame
    header (skipping DHT/DQT/APPn/etc by their big-endian lengths);
    height/width are u16 at frame-header bytes 3..7."""
    pos = 2  # past SOI
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers, no length
            continue
        seg_len = _struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = _struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return w, h, 1
        if marker == 0xDA:  # start of scan — no SOF seen, give up
            break
        pos += 2 + seg_len
    raise ValueError("corrupt JPEG: no SOF marker before scan data")


def _decode_wav(payload: bytes) -> tuple[int, int, int]:
    """WAV via stdlib ``wave`` — a genuine decode (chunk parse + PCM
    validation), not header sniffing. Convention for the rectangular
    DECODED_SCHEMA: width = sample rate (Hz), height = channel count,
    n_frames = PCM frame count."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        return wf.getframerate(), wf.getnchannels(), wf.getnframes()


def decode_payload(payload: bytes) -> tuple[int, int, int]:
    """Dispatch on container magic → (width, height, n_frames).

    Real formats handled with zero third-party deps: PNG, GIF, BMP, JPEG,
    WAV (stdlib ``wave``). The MM01 fixture container is kept for
    deterministic tests. Foreign/unknown formats raise — same contract a
    PIL/libav-backed decoder would have."""
    if payload is None or len(payload) < 10:
        raise ValueError("payload too short to decode")
    head = bytes(payload[:12])
    if head[:4] == _MAGIC:
        return _decode_mm01(payload)
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if head[:2] == b"BM":
        return _decode_bmp(payload)
    if head[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        "unrecognized media container (supported here: PNG, GIF, BMP, JPEG, "
        "WAV, MM01 fixture); full codec coverage needs PIL/libav bindings "
        "behind this same bytes -> dims contract"
    )


# backwards-compatible alias (pre-round-6 name; tests and docs referenced it)
_decode_stub = decode_payload


# ---------------------------------------------------------------------------
# PNG PIXEL decoding — stdlib zlib + numpy, no PIL required.
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/px


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = _struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        yield ctype, payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc


def png_pixels(payload: bytes):
    """Full PNG pixel decode with ONLY stdlib zlib + numpy: chunk walk,
    IDAT inflate, per-scanline defilter (None/Sub/Up/Average/Paeth),
    palette expansion. Returns a (height, width, channels) uint8 array.

    Supported: bit depth 8, color types 0/2/3/4/6, non-interlaced
    (Adam7 raises — the restriction is documented, not silent). Sub is
    defiltered with the uint8-overflow cumsum identity (wraparound IS
    mod-256, so the sequential recurrence vectorizes); Average/Paeth
    keep the spec's left-dependent scan loop.

    This replaces the round-6 claim that pixel decompression needs
    PIL — for PNG it does not; JPEG entropy decode remains the genuine
    PIL/libjpeg boundary."""
    import zlib

    import numpy as np

    if bytes(payload[:8]) != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    ihdr = palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(bytes(payload)):
        if ctype == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("corrupt PNG: missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 here)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"corrupt PNG: color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed size")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(filters[y]), lines[y]
        if f == 0:  # None
            rec = line.copy()
        elif f == 1:  # Sub: rec[i] = line[i] + rec[i-ch]
            rec = line.copy().reshape(-1, ch)
            np.cumsum(rec, axis=0, dtype=np.uint8, out=rec)  # wrap = mod 256
            rec = rec.reshape(-1)
        elif f == 2:  # Up
            rec = line + prev
        elif f == 3:  # Average (left-dependent: spec scan loop)
            rec = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(rec[i - ch]) if i >= ch else 0
                rec[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (left-dependent)
            rec = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(out[y - 1, i - ch]) if (i >= ch and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter {f}")
        out[y] = rec
        prev = out[y]
    px = out.reshape(h, w, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        px = palette[px.reshape(h, w)]
    return px


def encode_png(pixels, filters=None) -> bytes:
    """Minimal PNG writer (test fixture twin of png_pixels): bit depth
    8, color type from the channel count, optional per-line filter
    codes (default all-0) so every defilter branch is exercisable."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = [0] * h if filters is None else list(filters)
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int16)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            enc = np.empty(stride, dtype=np.int16)
            prev_row = prev
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev_row[i])
                c = int(prev_row[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = int(cur[i]) - pred
        else:
            raise ValueError(f"filter {f}")
        lines.append(f)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as _z

        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP PIXEL decoding — 24-bit BI_RGB, the uncompressed container.
# ---------------------------------------------------------------------------


def bmp_pixels(payload: bytes):
    """Full BMP pixel decode (24-bit uncompressed BI_RGB): BGR rows,
    4-byte row padding, bottom-up unless height is negative. Returns a
    (height, width, 3) uint8 RGB array. Other bit depths/compressions
    raise loudly (same contract as png_pixels)."""
    import numpy as np

    if bytes(payload[:2]) != b"BM":
        raise ValueError("not a BMP")
    data_off = _struct.unpack("<I", payload[10:14])[0]
    w, h = _struct.unpack("<ii", payload[18:26])
    bpp = _struct.unpack("<H", payload[28:30])[0]
    comp = _struct.unpack("<I", payload[30:34])[0]
    if bpp != 24:
        raise NotImplementedError(f"BMP bit depth {bpp} (only 24 here)")
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} (only BI_RGB)")
    bottom_up = h > 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    raw = np.frombuffer(
        bytes(payload[data_off : data_off + h * stride]), dtype=np.uint8
    )
    if raw.size != h * stride:
        raise ValueError("corrupt BMP: truncated pixel data")
    rows = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels) -> bytes:
    """Minimal 24-bit BMP writer (fixture twin of bmp_pixels)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("BMP fixture writer is 24-bit RGB only")
    stride = (3 * w + 3) & ~3
    body = bytearray()
    bgr = px[:, :, ::-1]
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = b"BM" + _struct.pack(
        "<IHHI", 54 + len(body), 0, 0, 54
    ) + _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return bytes(header + body)


# ---------------------------------------------------------------------------
# GIF PIXEL decoding — real LZW decompression, stdlib-only.
# ---------------------------------------------------------------------------


def _lzw_decode(mcs: int, data: bytes) -> list[int]:
    """GIF-flavor LZW: variable code width (mcs+1 .. 12, LSB-first bit
    packing), CLEAR resets the table, END terminates. Returns the index
    stream."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    big = int.from_bytes(bytes(data), "little")
    total_bits = len(data) * 8
    width = mcs + 1
    # Pre-seed the root table: encoders only *should* lead with CLEAR
    # (GIF89a spec appendix F); giflib/PIL decode streams that start with
    # a literal code, so we must too. CLEAR below stays as a pure reset.
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = end + 1
    prev: list[int] | None = None
    out: list[int] = []
    pos = 0
    while pos + width <= total_bits:
        code = (big >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = {i: [i] for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
            prev = None
            continue
        if code == end:
            return out
        if code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    raise ValueError("corrupt GIF: LZW stream ended without END code")


def _lzw_encode(indexes: list[int], mcs: int, clear_every: bool) -> bytes:
    """GIF-flavor LZW compressor. ``clear_every=True`` emits CLEAR
    before every literal (the spec-legal degenerate stream — exercises
    the decoder's reset path); False builds the table normally
    (exercises growth + width bumps)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out_codes: list[tuple[int, int]] = []  # (code, width-at-emit)
    width = mcs + 1
    if clear_every:
        for p in indexes:
            out_codes.append((clear, width))
            out_codes.append((p, width))
        out_codes.append((end, width))
    else:
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        out_codes.append((clear, width))
        run: tuple[int, ...] = ()
        for p in indexes:
            cand = run + (p,)
            if cand in table:
                run = cand
                continue
            out_codes.append((table[run], width))
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                # the decoder's table lags the encoder's by ONE add (it
                # adds nothing for the first code after CLEAR), so the
                # encoder must bump the width one entry AFTER its own
                # table crosses 2^w — the classic GIF off-by-one
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
            run = (p,)
        if run:
            out_codes.append((table[run], width))
        out_codes.append((end, width))
    big = 0
    pos = 0
    for code, w_ in out_codes:
        big |= code << pos
        pos += w_
    return big.to_bytes((pos + 7) // 8, "little")


def gif_pixels(payload: bytes):
    """Full GIF pixel decode for the FIRST frame: header walk, color
    table, real LZW decompression, palette expansion. Returns a
    (height, width, 3) uint8 array. Interlaced frames raise (documented
    restriction, like Adam7 in png_pixels)."""
    import numpy as np

    if bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            bytes(payload[pos : pos + 3 * n]), dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            w, h = _struct.unpack("<HH", payload[pos + 5 : pos + 9])
            flags = payload[pos + 9]
            pos += 10
            pal = gct
            if flags & 0x80:
                n = 2 << (flags & 0x07)
                pal = np.frombuffer(
                    bytes(payload[pos : pos + 3 * n]), dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if flags & 0x40:
                raise NotImplementedError("interlaced GIF frame")
            if pal is None:
                raise ValueError("corrupt GIF: no color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(mcs, bytes(data))
            if len(idx) < w * h:
                raise ValueError("corrupt GIF: not enough pixel indexes")
            arr = np.array(idx[: w * h], dtype=np.int64).reshape(h, w)
            if arr.max(initial=0) >= len(pal):
                raise ValueError("corrupt GIF: index outside color table")
            return pal[arr]
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{b0:02x}")
    raise ValueError("corrupt GIF: no image descriptor")


def encode_gif(pixels, clear_every: bool = False) -> bytes:
    """Minimal single-frame GIF writer (fixture twin of gif_pixels):
    builds a palette from the image's unique colors (≤256 required),
    real LZW compression (or the spec-legal clear-every-code stream)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("GIF fixture writer is RGB only")
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF fixture writer: more than 256 unique colors")
    size_exp = max(1, int(len(colors) - 1).bit_length() - 1 + 1)
    n_entries = 2 << (size_exp - 1)
    while n_entries < len(colors):
        size_exp += 1
        n_entries = 2 << (size_exp - 1)
    pal = np.zeros((n_entries, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    mcs = max(2, size_exp)
    body = _lzw_encode([int(i) for i in inverse], mcs, clear_every)
    out = bytearray()
    out += b"GIF89a"
    out += _struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_exp - 1), 0, 0])  # GCT flag + size
    out += pal.tobytes()
    out += b"\x2c" + _struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_pixels(payload: bytes):
    """Dispatch on container magic → (h, w, c) uint8 pixel array.
    Full pixel decompression with zero third-party deps for PNG (zlib
    inflate + defilter), BMP (24-bit BI_RGB), and GIF (real LZW). JPEG
    entropy decode remains the genuine PIL/libjpeg boundary."""
    head = bytes(payload[:8])
    if head == b"\x89PNG\r\n\x1a\n":
        px = png_pixels(payload)
    elif head[:2] == b"BM":
        px = bmp_pixels(payload)
    elif head[:6] in (b"GIF87a", b"GIF89a"):
        px = gif_pixels(payload)
    else:
        raise NotImplementedError(
            "pixel decode here covers PNG/BMP/GIF; JPEG entropy decode "
            "needs PIL/libjpeg behind this same bytes -> pixels contract"
        )
    if px.size == 0:
        # A syntactically valid header may still declare width/height 0;
        # fail with the same loud contract as any other corrupt payload
        # instead of a ZeroDivisionError deep inside a Spark task.
        raise ValueError("corrupt image: zero-area pixel grid")
    return px


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("min_pixel", T.IntegerType()),
        T.StructField("max_pixel", T.IntegerType()),
        T.StructField("pixel_crc32", T.LongType()),
    ]
)


def pixel_stats(df: DataFrame) -> DataFrame:
    """Per-image PIXEL statistics for PNG/BMP/GIF payloads
    (mapInPandas, Arrow-batched): exact mean (integer pixel sum ÷
    count), min/max, and a crc32 of the raw reconstructed pixels (the
    determinism handle — any defilter/LZW/stride bug changes it).
    Other payloads raise, the same loud-failure contract as
    decode_payload; filter upstream with kind == 'image' + magic."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_pixels(payload)
                h, w, c = px.shape
                total = int(px.sum(dtype="int64"))
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        c,
                        total / (h * w * c),
                        int(px.min()),
                        int(px.max()),
                        zlib.crc32(px.tobytes()) & 0xFFFFFFFF,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_pixel",
                    "min_pixel",
                    "max_pixel",
                    "pixel_crc32",
                ],
            )

    return df.mapInPandas(run, PIXEL_STATS_SCHEMA)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode dimensions/frame counts from media payloads (mapInPandas).

    Batch-iterator shape: each pandas batch maps to one output batch;
    payload bytes stay executor-local.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic feature vectors from payload content (mapInPandas).

    Stub featurizer: sha256-seeded pseudo-embedding — stands in for a CNN/
    CLIP encoder with the identical dataflow (binary in, array<float> out).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                # counter-mode hash stream: one sha256 block per 8 floats,
                # so the output honors `dim` exactly (a single digest is
                # 32 bytes = 8 floats — silently truncating to that was a
                # bug for the default dim=16)
                stream = b"".join(
                    hashlib.sha256(bytes(p) + bytes([blk])).digest()
                    for blk in range((dim * 4 + 31) // 32)
                )
                feats.append(
                    [
                        int.from_bytes(stream[4 * i : 4 * i + 4], "little")
                        / float(2**32)
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 10) -> DataFrame:
    """Sampled frame indices per video (pure column algebra — no Python):
    frames [0, k, 2k, ...) from the decoded frame count."""
    decoded = decode_media(df.filter(F.col("kind") == "video"))
    return decoded.select(
        "media_id",
        F.sequence(
            F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_k)
        ).alias("frame_indices"),
    )


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as column algebra on
    decoded dims; the byte-level resample would live in the same
    mapInPandas stage as decode in production."""
    decoded = decode_media(df)
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"),
        F.lit(float(max_side)) / F.col("height"),
        F.lit(1.0),
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale).cast("int").alias("target_height"),
    )


def png_fixture(spark: SparkSession, n: int = 24, seed: int = 31) -> DataFrame:
    """Deterministic REAL-PNG fixture: n images cycling through every
    supported channel count (1/2/3/4) and PNG filter type (0-4), pixels
    from a seeded numpy Generator — so the full zlib+defilter path runs
    under the same MEDIA_SCHEMA contract as the MM01 fixture."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ch = (1, 2, 3, 4)[i % 4]
        h, w = int(rng.integers(3, 12)), int(rng.integers(3, 12))
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        rows.append(
            (
                i,
                "image",
                bytearray(encode_png(px, filters=[(i + y) % 5 for y in range(h)])),
                {"codec": "png", "filters": "cycled"},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# WAV PCM SAMPLE decoding — stdlib wave + numpy (audio twin of
# pixel_stats): PCM is uncompressed, so this is a full sample decode,
# not header sniffing.
# ---------------------------------------------------------------------------


def wav_samples(payload: bytes):
    """Decode 16-bit PCM WAV to a (n_frames, n_channels) int16 array
    plus the sample rate. Other sample widths raise loudly."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV sample width {wf.getsampwidth()} (only 16-bit here)"
            )
        if wf.getcomptype() != "NONE":
            raise NotImplementedError("compressed WAV")
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, dtype="<i2").reshape(
            -1, wf.getnchannels()
        )
        return arr, wf.getframerate()


SAMPLE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("min_sample", T.IntegerType()),
        T.StructField("max_sample", T.IntegerType()),
        T.StructField("sample_crc32", T.LongType()),
    ]
)


def sample_stats(df: DataFrame) -> DataFrame:
    """Per-clip PCM statistics for WAV payloads (mapInPandas,
    Arrow-batched): exact mean (int64 sample sum ÷ count), min/max,
    crc32 of the raw little-endian sample bytes (the determinism
    handle). The audio twin of ``pixel_stats``."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr, rate = wav_samples(payload)
                n = arr.size
                rows.append(
                    (
                        mid,
                        rate,
                        arr.shape[1],
                        arr.shape[0],
                        int(arr.sum(dtype="int64")) / n if n else None,
                        int(arr.min()) if n else None,
                        int(arr.max()) if n else None,
                        zlib.crc32(arr.tobytes()) & 0xFFFFFFFF,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_frames",
                    "mean_sample",
                    "min_sample",
                    "max_sample",
                    "sample_crc32",
                ],
            )

    return df.mapInPandas(run, SAMPLE_STATS_SCHEMA)


def encode_wav(samples, rate: int = 8000) -> bytes:
    """Minimal 16-bit PCM WAV writer (stdlib wave; fixture twin of
    wav_samples)."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(arr.tobytes())
    return buf.getvalue()


def wav_fixture(spark: SparkSession, n: int = 16, seed: int = 53) -> DataFrame:
    """Deterministic WAV fixture: n clips cycling mono/stereo, integer
    sawtooth + seeded-noise samples (no libm trig — exact everywhere),
    varying lengths and rates."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ch = 1 + (i % 2)
        frames = int(rng.integers(50, 400))
        rate = (8000, 16000, 44100)[i % 3]
        t = np.arange(frames * ch, dtype=np.int64)
        saw = ((t * (i + 3)) % 2048 - 1024).astype("<i2")
        noise = rng.integers(-256, 256, size=t.size).astype("<i2")
        samples = (saw + noise).reshape(frames, ch)
        rows.append(
            (
                i,
                "audio",
                bytearray(encode_wav(samples, rate)),
                {"codec": "pcm16", "rate": str(rate)},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def parity_fixture(spark: SparkSession, n: int = 12, seed: int = 47) -> DataFrame:
    """Cross-container parity fixture: n RGB images, each encoded as
    PNG (cycled filters), BMP, and GIF (alternating real-LZW and
    clear-every-code streams) — 3n rows sharing media_id per image, so
    pixel crc32 equality across containers is checkable by a groupBy.
    Colors are drawn from a small palette (GIF ≤256-color bound)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = int(rng.integers(3, 14)), int(rng.integers(3, 14))
        pal = np.unique(
            rng.integers(0, 256, size=(20, 3), dtype=np.uint8), axis=0
        )
        px = pal[rng.integers(0, len(pal), size=(h, w))]
        payloads = {
            "png": encode_png(px, filters=[(i + y) % 5 for y in range(h)]),
            "bmp": encode_bmp(px),
            "gif": encode_gif(px, clear_every=bool(i % 2)),
        }
        for codec, payload in payloads.items():
            rows.append(
                (i, "image", bytearray(payload), {"codec": codec})
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_fixture(spark: SparkSession, n: int = 64, seed: int = 23) -> DataFrame:
    """Deterministic media fixture in the MM01 container format."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = rng.randrange(64, 4096), rng.randrange(64, 4096)
        frames = 1 if kind == "image" else rng.randrange(24, 2400)
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(16, 128)))
        rows.append(
            (
                i,
                kind,
                bytearray(encode_fake_media(w, h, frames, body)),
                {"source": f"cam{i % 5}", "codec": "mm01"},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
