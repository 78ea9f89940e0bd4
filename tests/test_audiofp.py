"""Audio landmark fingerprinting: spec-level unit checks plus the
end-to-end near-dup pipeline over the seeded corpus."""

from __future__ import annotations

import numpy as np

from postgresimporter_spark.operators.audiofp import (
    BANDS,
    FRAME_SAMPLES,
    landmarks_from_pcm,
)


def _tone(bin_: int, frames: int = 4, rate: int = 8000) -> np.ndarray:
    n = frames * FRAME_SAMPLES
    t = np.arange(n) / rate
    freq = bin_ * rate / FRAME_SAMPLES
    return (10000 * np.sin(2 * np.pi * freq * t)).astype("<i2")


def test_landmarks_deterministic_and_on_bin():
    """A pure on-bin tone peaks at exactly that bin in its band, every
    frame; landmark hashes decode back to (band, p1, p2, dt)."""
    mono = _tone(bin_=12).astype(np.float64)
    lms = landmarks_from_pcm(mono, 8000)
    assert lms == landmarks_from_pcm(mono, 8000)
    # band 1 covers bins 9..24: the tone's landmarks there are (12, 12)
    for t, h in lms:
        dt = h % 4
        rest = h // 4
        p2 = rest % 256
        rest //= 256
        p1 = rest % 256
        band = rest // 256
        assert dt in (1, 2)
        assert 0 <= band < len(BANDS)
        lo, hi = BANDS[band]
        assert lo <= p1 <= hi and lo <= p2 <= hi
        if band == 1:
            assert (p1, p2) == (12, 12)


def test_landmarks_short_input_empty():
    assert landmarks_from_pcm(np.zeros(FRAME_SAMPLES - 1), 8000) == []
    assert landmarks_from_pcm(np.zeros(FRAME_SAMPLES), 8000) == []


def test_audio_neardup_pipeline(spark):
    """End-to-end: corpus -> mapInPandas landmarks -> hash join ->
    offset vote. Every re-recording pairs with exactly its original at
    the corpus's lead-in offset; the corrupt row yields zero landmarks
    (never a failure); no unrelated pair crosses the threshold."""
    from postgresimporter_spark.operators.audiofp import (
        audio_landmarks,
        audio_neardup_pairs,
    )
    from postgresimporter_spark.operators.mediagen import (
        AFP_SHIFT_FRAMES,
        audio_fp_corpus,
    )
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(audio_fp_corpus(n_base=6), MEDIA_SCHEMA)
    lm_paths = {
        r.path for r in audio_landmarks(media).select("path").distinct().collect()
    }
    assert "corrupt_fp.bin" not in lm_paths
    assert "trk00.wav" in lm_paths

    pairs = {
        (r.track_a, r.track_b): (r.offset, r.n_matched)
        for r in audio_neardup_pairs(media, min_matched=8).collect()
    }
    assert set(pairs) == {
        (f"trk{s:02d}.wav", f"trk{s:02d}_re.wav") for s in range(3)
    }
    for off, n in pairs.values():
        assert off == -AFP_SHIFT_FRAMES
        assert n >= 8
