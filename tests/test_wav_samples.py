"""Full WAV PCM sample decode — round-trips through the stdlib wave
writer, exact stats through the Spark sample_stats operator, loud
failures on unsupported widths."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from data_engineering_project_capstone_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_wav,
    sample_stats,
    wav_fixture,
    wav_samples,
)

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("ch,frames,rate", [(1, 100, 8000), (2, 333, 44100)])
def test_wav_roundtrip(ch, frames, rate):
    samples = RNG.integers(-32768, 32768, size=(frames, ch)).astype("<i2")
    arr, got_rate = wav_samples(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(arr, samples)


def test_wav_8bit_raises():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes(range(10)))
    with pytest.raises(NotImplementedError, match="sample width"):
        wav_samples(buf.getvalue())


def test_sample_stats_operator_exact(spark):
    clips = [
        RNG.integers(-1000, 1000, size=(50, 1)).astype("<i2"),
        RNG.integers(-32768, 32768, size=(75, 2)).astype("<i2"),
    ]
    rows = [
        (i, "audio", bytearray(encode_wav(c, 16000)), {})
        for i, c in enumerate(clips)
    ]
    got = {
        r["media_id"]: r
        for r in sample_stats(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    for i, c in enumerate(clips):
        r = got[i]
        assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (
            16000,
            c.shape[1],
            c.shape[0],
        )
        assert r["mean_sample"] == int(c.sum(dtype="int64")) / c.size
        assert (r["min_sample"], r["max_sample"]) == (
            int(c.min()),
            int(c.max()),
        )
        assert r["sample_crc32"] == zlib.crc32(c.tobytes()) & 0xFFFFFFFF


def test_fixture_covers_mono_and_stereo(spark):
    rows = sample_stats(wav_fixture(spark)).collect()
    assert len(rows) == 16
    assert {r["n_channels"] for r in rows} == {1, 2}
    assert {r["sample_rate"] for r in rows} == {8000, 16000, 44100}
