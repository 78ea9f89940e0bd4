"""Batch 66: audio landmark fingerprinting — the audio leg of the
perceptual near-dup family (image pHash q280/q281, video frame
hashes q300), completing dedup across all three media modalities.

q307 runs the LIVE chain — PCM decode -> per-frame spectra -> banded
peak constellation -> packed landmark hashes -> hash equi-join ->
offset-consistency vote (``operators/audiofp``) — over the seeded
``audio_fp_corpus``; the oracle replays the identical relational
match over landmark hashes FROZEN by an independent model (stdlib
``wave`` decode + explicit DFT matrix, ``tests/gen_media_expected``),
so decode, spectra, peak picking, hashing, and matching are all
externally checked. Scheme: Wang, ISMIR 2003 (public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import QueryDef

AFP_MIN_MATCHED = 8


def q307_audio_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs over the seeded fingerprint corpus:
    each re-recording (noisy, quieter, 2-frame lead-in) must match its
    original at one consistent offset; unrelated chord tracks must
    stay under the vote threshold."""
    from ..operators.audiofp import audio_neardup_pairs
    from ..operators.mediagen import audio_fp_corpus
    from ..operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(audio_fp_corpus(), MEDIA_SCHEMA)
    return audio_neardup_pairs(media, min_matched=AFP_MIN_MATCHED)


def _afp_oracle() -> str:
    from .media_expected import AUDIO_LANDMARKS

    vals = ", ".join(f"('{p}', {t}, {h})" for p, t, h in AUDIO_LANDMARKS)
    return f"""
WITH lm(path, t, h) AS (VALUES {vals}),
votes AS (
  SELECT a.path AS track_a, b.path AS track_b,
         a.t - b.t AS off, COUNT(DISTINCT a.t) AS n
  FROM lm a JOIN lm b ON a.h = b.h AND a.path < b.path
  GROUP BY 1, 2, 3),
best AS (
  SELECT track_a, track_b, off, n,
         ROW_NUMBER() OVER (PARTITION BY track_a, track_b
                            ORDER BY n DESC, off) AS rn
  FROM votes)
SELECT track_a, track_b, CAST(off AS BIGINT) AS offset,
       CAST(n AS BIGINT) AS n_matched
FROM best WHERE rn = 1 AND n >= {AFP_MIN_MATCHED}
"""


def batch66_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q307_audio_landmarks",
            q307_audio_landmarks,
            _afp_oracle(),
            "constellation audio near-dup vs frozen independent landmarks",
        ),
    ]
