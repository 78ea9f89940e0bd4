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


def _row_level_reference(media, min_matched=8):
    """The pre-r10 row-level layout, kept as the brute reference for
    the value-level rewrite (same discipline as semdedup's brute
    equality test)."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.audiofp import audio_landmarks

    lm = audio_landmarks(media)
    a, b = lm.alias("a"), lm.alias("b")
    votes = (
        a.join(b, on="lm_hash")
        .where(F.col("a.path") < F.col("b.path"))
        .groupBy(
            F.col("a.path").alias("track_a"),
            F.col("b.path").alias("track_b"),
            (F.col("a.t") - F.col("b.t")).alias("offset"),
        )
        .agg(F.count_distinct(F.col("a.t")).cast("long").alias("n_matched"))
    )
    best = F.array_min(
        F.collect_list(
            F.struct(
                (-F.col("n_matched")).alias("neg"),
                F.col("offset").alias("off"),
            )
        )
    )
    return (
        votes.groupBy("track_a", "track_b")
        .agg(best.alias("_b"))
        .select(
            "track_a",
            "track_b",
            F.col("_b.off").alias("offset"),
            (-F.col("_b.neg")).cast("long").alias("n_matched"),
        )
        .where(F.col("n_matched") >= min_matched)
    )


def test_audio_neardup_duplicate_families(spark):
    """The r10 value-level rewrite must match the row-level join
    EXACTLY (full tuples, offsets included) on a duplicate-family
    corpus. The copy prefixes interleave the path order across
    families ("01_trk00.wav" > "00_trk00_re.wav"), so the swap-aware
    offset expansion — sign flip AND flipped tie-break — is exercised,
    and an amplitude-scaled re-master (different bytes, identical
    landmark set) lands in the same value family."""
    from postgresimporter_spark.operators.audiofp import audio_neardup_pairs
    from postgresimporter_spark.operators.mediagen import (
        AFP_RATE,
        _afp_samples,
        audio_fp_corpus,
        wav_bytes,
    )
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    for path, mod, content, meta in audio_fp_corpus(n_base=4):
        for c in range(3):
            rows.append((f"{c:02d}_{path}", mod, content, meta))
    rows.append(
        (
            "remaster_trk00.wav",
            "audio",
            bytearray(wav_bytes(_afp_samples(0, amp_scale=0.5), rate=AFP_RATE)),
            None,
        )
    )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    ref = sorted(tuple(r) for r in _row_level_reference(media).collect())
    got = sorted(tuple(r) for r in audio_neardup_pairs(media).collect())
    assert got == ref
    assert len(got) > 0
    # the remaster merged into trk00's family: it pairs with every
    # byte-identical copy at offset 0 with the full anchor count
    zero = [t for t in got if "remaster_trk00.wav" in (t[0], t[1]) and t[2] == 0]
    assert len(zero) == 3


def test_audio_neardup_hash_cap(spark):
    """max_hash_ratio drops hot hashes LOUDLY: cap 1.0 is a no-op,
    a vanishing cap kills every pair (same-value pairs included —
    their anchor count is defined over the surviving hash space), and
    hot_landmark_hashes reports a non-empty drop set on a
    duplicate-family corpus."""
    from postgresimporter_spark.operators.audiofp import (
        audio_neardup_pairs,
        hot_landmark_hashes,
    )
    from postgresimporter_spark.operators.mediagen import audio_fp_corpus
    from postgresimporter_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    for path, mod, content, meta in audio_fp_corpus(n_base=4):
        for c in range(3):
            rows.append((f"{c:02d}_{path}", mod, content, meta))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    uncapped = sorted(tuple(r) for r in audio_neardup_pairs(media).collect())
    noop = sorted(
        tuple(r) for r in audio_neardup_pairs(media, max_hash_ratio=1.0).collect()
    )
    assert noop == uncapped and len(uncapped) > 0
    assert audio_neardup_pairs(media, max_hash_ratio=1e-9).count() == 0
    assert hot_landmark_hashes(media, 1e-9).count() > 0
    assert hot_landmark_hashes(media, 1.0).count() == 0
