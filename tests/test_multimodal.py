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
