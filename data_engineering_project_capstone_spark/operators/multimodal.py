"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for a 100 TB media pipeline (north-star extension):

- Media rows are ``(media_id, kind, payload: binary, meta: map<string,string>)``.
  The payload never leaves the executor; Python touches it only inside
  Arrow-batched ``mapInPandas`` operators.
- Decode / feature-extract / resize / frame-sample are ``mapInPandas``
  stages: per-partition batch iterators, so batch size (not row count)
  bounds memory, and the operators compose into one narrow pipeline stage —
  no shuffle between media ops.
- The actual codec calls are STUBBED (this container has no image/audio
  libraries): ``_decode_stub`` parses a deterministic fake header instead.
  The Spark-side contract — schemas, UDF signatures, batch iteration,
  partitioning — is real and tested; swap ``_decode_stub`` for
  PIL/libav/ffmpeg bindings behind the same signature in production.
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


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: parses the fixture header. Production swaps this for
    PIL.Image.open / av.open behind the identical (bytes) -> dims contract;
    raises on foreign formats exactly like a real decoder would."""
    if payload is None or len(payload) < 10 or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real image/audio decoding not available in this environment; "
            "payload is not in the MM01 fixture format"
        )
    w, h, n = _struct.unpack("<HHH", payload[4:10])
    return w, h, n


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
