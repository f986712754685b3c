"""Audio binary-column operators: codec round-trip and windowed feature
extraction checked against closed-form signal math."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from ml_pipelines_spark.operators.audio import (
    audio_frame_features,
    decode_audio,
    encode_audio,
)


def _sine(amp: float, freq: float, rate: int, n: int) -> np.ndarray:
    t = np.arange(n) / rate
    return np.round(amp * np.sin(2 * math.pi * freq * t)).astype(np.int16)


def test_codec_roundtrip():
    s = _sine(8000, 440, 16000, 1600)
    samples, rate = decode_audio(encode_audio(s, 16000))
    assert rate == 16000
    assert np.array_equal(samples, s)


def test_rejects_real_containers():
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"RIFF" + b"\x00" * 64)


def test_frame_features_match_closed_form(spark):
    rate, n = 16000, 16000
    # 100 Hz sine, amplitude 10000: RMS ~ A/sqrt(2); 2 crossings per
    # cycle -> 100 Hz over a 1600-sample (0.1 s) frame = ~20 crossings
    clip = _sine(10000, 100, rate, n)
    schema = StructType(
        [StructField("clip_id", LongType()), StructField("audio_bytes", BinaryType())]
    )
    df = spark.createDataFrame([(1, bytearray(encode_audio(clip, rate)))], schema)
    feats = audio_frame_features(df, frame_len=1600).collect()
    assert len(feats) == 10  # 16000 / 1600 non-overlapping frames
    for r in feats:
        assert r["n_samples"] == 1600
        assert abs(r["rms"] - 10000 / math.sqrt(2)) / (10000 / math.sqrt(2)) < 0.01
        assert abs(r["zero_crossings"] - 20) <= 1
    # hop < frame_len produces overlapping frames
    overlapped = audio_frame_features(df, frame_len=1600, hop=800).collect()
    assert len(overlapped) == 19  # 1 + (16000-1600)//800


def test_silence_and_short_clips(spark):
    rate = 8000
    silent = np.zeros(1000, dtype=np.int16)
    short = np.ones(10, dtype=np.int16)
    schema = StructType(
        [StructField("clip_id", LongType()), StructField("audio_bytes", BinaryType())]
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_audio(silent, rate))),
         (2, bytearray(encode_audio(short, rate)))],
        schema,
    )
    feats = audio_frame_features(df, frame_len=500).collect()
    # short clip (< frame_len) contributes no frames; silence has rms 0
    assert {r["clip_id"] for r in feats} == {1}
    assert all(r["rms"] == 0.0 and r["zero_crossings"] == 0 for r in feats)


def test_real_codec_seam():
    """soundfile seam — same contract as the image seam: real WAV bytes
    round-trip when the library exists, documented NotImplementedError
    otherwise."""
    import numpy as np
    import pytest

    from ml_pipelines_spark.operators.audio import (
        HAS_SOUNDFILE,
        decode_audio,
        encode_audio,
    )

    riff_head = b"RIFF" + b"\x00" * 40
    if not HAS_SOUNDFILE:
        with pytest.raises(NotImplementedError):
            decode_audio(riff_head)
        with pytest.raises(NotImplementedError):
            encode_audio(np.zeros(8, dtype=np.int16), 16000, fmt="wav")
        return
    samples = (np.sin(np.linspace(0, 20, 800)) * 1000).astype(np.int16)
    data = encode_audio(samples, 16000, fmt="wav")
    assert bytes(data[:4]) == b"RIFF"
    out, rate = decode_audio(data)
    assert rate == 16000
    assert np.array_equal(out, samples)
