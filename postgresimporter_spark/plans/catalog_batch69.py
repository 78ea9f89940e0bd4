"""Batch 69: cross-modal perceptual near-dup.

q312 closes the near-dup family's last edge: image-image (q281),
video-video (q300), audio-audio (q307) — and now image-VIDEO, the
"which stills are reused inside videos" curation question. The corpus
pairs 64x64 PNG stills with 32x32 MJPEG frames built from the SAME
8x8 texture bases, so pHash resize invariance makes the true matches
EXACT (verified: the frozen still hashes equal the frozen frame
hashes bit-for-bit); unrelated stills and an undecodable row must
stay out. The live chain is still-decode -> pHash, video -> frame
sample -> pHash, tagged union -> exact MIH Hamming join; the oracle
replays the join over the independently-frozen CROSS_MODAL_PHASH and
VIDEO_FRAME_PHASH tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import QueryDef

XM_MAX_HAMMING = 10


def q312_cross_modal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stills reused inside videos over the seeded cross-modal corpus:
    (image_path, video_path, frame_ms, hamming) within 10 bits."""
    from ..operators.imagehash import cross_modal_neardup_pairs
    from ..operators.mediagen import FRAME_EVERY_MS, cross_modal_corpus
    from ..operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(cross_modal_corpus(), MEDIA_SCHEMA)
    return cross_modal_neardup_pairs(
        media, every_ms=FRAME_EVERY_MS, max_hamming=XM_MAX_HAMMING
    )


def _xm_oracle() -> str:
    from .media_expected import CROSS_MODAL_PHASH, VIDEO_FRAME_PHASH

    img_vals = ", ".join(
        f"('{p}', {h})" for p, h in CROSS_MODAL_PHASH if h is not None
    )
    vf_vals = ", ".join(
        f"('{p}', {ms}, {h})" for p, ms, h in VIDEO_FRAME_PHASH
    )
    return f"""
WITH img(path, phash) AS (VALUES {img_vals}),
vf(path, frame_ms, phash) AS (VALUES {vf_vals})
SELECT i.path AS image_path, v.path AS video_path,
       CAST(v.frame_ms AS BIGINT) AS frame_ms,
       CAST(bit_count(xor(i.phash, v.phash)) AS BIGINT) AS hamming
FROM img i JOIN vf v
  ON bit_count(xor(i.phash, v.phash)) <= {XM_MAX_HAMMING}
"""


def batch69_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q312_cross_modal_neardup",
            q312_cross_modal_neardup,
            _xm_oracle(),
            "stills-in-videos cross-modal pHash match vs frozen hashes",
        ),
    ]
