"""Audio landmark fingerprinting on REAL decoded PCM — the audio leg
of the near-dup family (image pHash: ``imagehash``; video frame
hashes: ``imagehash.video_frame_phashes``), completing perceptual
dedup across all three media modalities.

The scheme is the classic spectral-peak constellation (Wang,
"An Industrial-Strength Audio Search Algorithm", ISMIR 2003 —
public): per fixed-size frame, the peak frequency bin of each of four
log-spaced bands; landmarks pair a band's anchor peak with the same
band's peak 1 and 2 frames ahead, packed into one integer hash
``((band*256 + p1)*256 + p2)*4 + dt``. Two recordings of the same
material share many landmark hashes at a CONSISTENT frame offset;
unrelated audio collides only incidentally and never consistently —
so matching is one hash equi-join plus an offset histogram, never a
spectral cross-correlation of all pairs.

Exact spec (both the operator and the independent oracle model in
``tests/gen_media_expected.py`` implement this text):

- frames: non-overlapping windows of ``FRAME_SAMPLES`` = 256 samples,
  at most ``MAX_FRAMES`` = 256 frames (bounded memory per row, same
  contract as ``audiofeat._MAX_SAMPLES``); no window function
  (rectangular) — determinism over sidelobe suppression.
- spectrum: magnitude of the real FFT, bins 0..128.
- bands (inclusive bin ranges, DC excluded): (1,8), (9,24), (25,56),
  (57,128); peak = argmax with ties to the LOWEST bin.
- landmarks: for ``dt`` in (1, 2), every frame t with a partner at
  t+dt emits the packed hash above; t is the anchor frame index.

Honesty boundary (matches ``audiofeat``): non-PCM/undecodable bytes
yield ZERO landmark rows (log-and-continue), never task failures and
never fabricated hashes.

Scale: landmark extraction is per-row Arrow-batched ``mapInPandas``
(no shuffle until the match join); the match is a hash equi-join on
the packed landmark — bucketed by construction, candidate volume
bounded by true hash collisions, with the offset-consistency filter
applied AFTER the join as a cheap row-local subtraction.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SAMPLES = 256
MAX_FRAMES = 256
BANDS = ((1, 8), (9, 24), (25, 56), (57, 128))
LANDMARK_DTS = (1, 2)

LANDMARK_SCHEMA = "path string, t long, lm_hash long"


def landmarks_from_pcm(mono: np.ndarray, rate: int) -> list[tuple[int, int]]:
    """(anchor frame index, packed landmark hash) rows for one PCM
    stream, per the module spec. ``rate`` is accepted for signature
    symmetry; the scheme is defined on frames, not seconds."""
    n_frames = min(len(mono) // FRAME_SAMPLES, MAX_FRAMES)
    if n_frames < 2:
        return []
    frames = mono[: n_frames * FRAME_SAMPLES].reshape(
        n_frames, FRAME_SAMPLES
    )
    mag = np.abs(np.fft.rfft(frames, axis=1))
    peaks = np.empty((n_frames, len(BANDS)), dtype=np.int64)
    for b, (lo, hi) in enumerate(BANDS):
        peaks[:, b] = lo + np.argmax(mag[:, lo : hi + 1], axis=1)
    out = []
    for dt in LANDMARK_DTS:
        for t in range(n_frames - dt):
            for b in range(len(BANDS)):
                h = (
                    (b * 256 + int(peaks[t, b])) * 256 + int(peaks[t + dt, b])
                ) * 4 + dt
                out.append((t, h))
    return out


def audio_landmarks(media: DataFrame) -> DataFrame:
    """Per-row landmark extraction via Arrow-batched ``mapInPandas``;
    undecodable rows yield zero rows, never failures."""
    import pandas as pd

    from .audiofeat import decode_pcm

    def _run(batches):
        for pdf in batches:
            paths, ts, hashes = [], [], []
            for _, r in pdf.iterrows():
                try:
                    mono, rate = decode_pcm(bytes(r["content"]))
                except Exception:  # noqa: BLE001 - log-and-continue
                    continue
                for t, h in landmarks_from_pcm(mono, rate):
                    paths.append(r["path"])
                    ts.append(t)
                    hashes.append(h)
            yield pd.DataFrame(
                {"path": paths, "t": ts, "lm_hash": hashes}
            )

    return media.select("path", "content").mapInPandas(
        _run, schema=LANDMARK_SCHEMA
    )


def audio_neardup_pairs(
    media: DataFrame, min_matched: int = 8
) -> DataFrame:
    """Audio near-duplicate pairs: two tracks qualify when at least
    ``min_matched`` anchor frames carry hash-equal landmarks at ONE
    consistent frame offset (the constellation vote). Returns
    (track_a, track_b, offset, n_matched) with track_a < track_b and
    ``offset = t_a - t_b`` of the winning alignment (largest
    n_matched, smallest offset on ties — total order)."""
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
        .agg(best.alias("_best"))
        .select(
            "track_a",
            "track_b",
            F.col("_best.off").alias("offset"),
            (-F.col("_best.neg")).cast("long").alias("n_matched"),
        )
        .where(F.col("n_matched") >= min_matched)
    )


__all__ = [
    "FRAME_SAMPLES",
    "MAX_FRAMES",
    "BANDS",
    "LANDMARK_DTS",
    "LANDMARK_SCHEMA",
    "landmarks_from_pcm",
    "audio_landmarks",
    "audio_neardup_pairs",
]
