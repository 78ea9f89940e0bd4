"""Audio features on synthesized PCM: known-signal spectral checks
and the distributed extraction path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from postgresimporter_spark.operators.audiofeat import (
    audio_features,
    decode_pcm,
    extract_audio_features,
)


def _wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _sine(freq: float, rate: int = 8000, secs: float = 1.0, amp=10000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype("<i2")


def test_sine_centroid_and_zcr():
    wav = _wav(_sine(440.0))
    f = audio_features(wav)
    assert f["duration_ms"] == 1000
    assert abs(f["spectral_centroid_hz"] - 440.0) < 5.0
    assert abs(f["spectral_rolloff_hz"] - 440.0) < 10.0
    assert f["spectral_bandwidth_hz"] < 40.0  # a pure tone is narrow
    # a 440 Hz sine crosses zero 880 times/sec
    assert abs(f["zero_crossing_rate"] - 2 * 440 / 8000) < 0.002
    assert abs(f["rms"] - 10000 / np.sqrt(2)) < 50


def test_two_tone_centroid_between():
    s = (_sine(300).astype(int) + _sine(1200).astype(int)) // 2
    f = audio_features(_wav(s.astype("<i2")))
    assert 300 < f["spectral_centroid_hz"] < 1200
    assert f["spectral_bandwidth_hz"] > 300  # two far tones are wide


def test_stereo_mono_mix():
    left = _sine(440)
    right = np.zeros_like(left)
    inter = np.empty(2 * len(left), dtype="<i2")
    inter[0::2] = left
    inter[1::2] = right
    f = audio_features(_wav(inter, channels=2))
    assert f["duration_ms"] == 1000
    assert abs(f["spectral_centroid_hz"] - 440.0) < 5.0
    mono, rate = decode_pcm(_wav(inter, channels=2))
    assert rate == 8000 and len(mono) == len(left)


def test_non_pcm_raises():
    with pytest.raises(ValueError):
        audio_features(b"\x00\x01garbage")
    # IEEE-float WAV (format tag 3) is out of PCM scope
    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    wav3 = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        audio_features(wav3)


def test_extract_audio_features_distributed(spark):
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        ("tone.wav", "audio", bytearray(_wav(_sine(440.0))), None),
        ("bad.bin", "audio", bytearray(b"\x01\x02\x03"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.path: r for r in extract_audio_features(media).collect()}
    assert abs(got["tone.wav"].spectral_centroid_hz - 440.0) < 5.0
    assert got["tone.wav"].sample_rate == 8000
    assert got["bad.bin"].spectral_centroid_hz is None  # null, not fake
    assert got["bad.bin"].duration_ms is None
