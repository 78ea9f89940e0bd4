"""Batch 79: audio landmark near-dup over DUPLICATE-FAMILY corpora,
plus the hot-hash cap's exact semantics.

Round-10 maintenance-rule trigger (b), scale-failure repro (the same
probe program that produced q321/q322): ``audiofp.audio_neardup_
pairs`` joined landmark ROWS on lm_hash, so k byte-identical copies
of a track (the re-upload shape) inflated every hash bucket k-fold
and the vote join k^2-fold. Measured on a 2,440-track corpus built as
61 duplicate families (40x copies): 189s row-level vs 8.7s after the
value-level rewrite (identical 88,400-pair output); the all-distinct
2,440-track control ran 119s — i.e. duplication alone was costing
~70s and diverging quadratically. The same probe exposed the SECOND
quadratic axis: the control's 119s is the low-entropy-hash collision
cost (band 0 packs only 8x8x2 hash combinations, so its buckets grow
with corpus size and the join with its square) — mitigated by the
opt-in ``max_hash_ratio`` cap + ``hot_landmark_hashes`` audit, the
``hot_shingles``/``hot_bands`` contract applied to the audio leg.

q323 pins the duplicate-family shape externally (3x-replicated
fingerprint corpus; the oracle replays the row-level match over the
frozen independent landmarks of ``tests/gen_media_expected``,
replicated the same way). q324 pins the cap semantics: hashes carried
by more than ``AFP_CAP_RATIO`` of the tracks are dropped BEFORE the
join on both sides, and votes/anchor counts are defined over the
surviving hash space only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import QueryDef
from .catalog_batch66 import AFP_MIN_MATCHED

AFP_DUP_COPIES = 3
AFP_CAP_RATIO = 0.25


def _duped_media(spark: SparkSession):
    from ..operators.mediagen import audio_fp_corpus
    from ..operators.multimodal import MEDIA_SCHEMA

    rows = []
    for path, mod, content, meta in audio_fp_corpus():
        for j in range(AFP_DUP_COPIES):
            rows.append((f"{j:02d}_{path}", mod, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def q323_audio_neardup_dupfamilies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio near-dup pairs over 3x byte-identical copies of the
    fingerprint corpus under prefixed paths — dominated by the
    C(3,2)-per-family offset-0 self pairs the value-level rewrite
    must emit without quadratic vote work, plus the cross-family
    re-recording matches whose member orderings interleave
    ("01_trk00.wav" > "00_trk00_re.wav"), exercising the swap-aware
    offset expansion."""
    from ..operators.audiofp import audio_neardup_pairs

    return audio_neardup_pairs(
        _duped_media(spark), min_matched=AFP_MIN_MATCHED
    )


def q324_audio_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with the hot-hash skew cap at 0.25: landmark
    hashes carried by more than a quarter of the decodable tracks are
    dropped before the join; the vote and the duplicate-pair anchor
    counts run over the surviving hash space. 0.25 is chosen so the
    cap BITES on this corpus without losing pairs — the same 54 pairs
    survive but with different winning (offset, n_matched) votes than
    q323's uncapped run (verified when the ratio was picked; at 0.2
    the re-recording matches die, at 0.4 the cap is a no-op), so the
    oracle check fails loudly if either the drop rule or the
    surviving-space vote drifts."""
    from ..operators.audiofp import audio_neardup_pairs

    return audio_neardup_pairs(
        _duped_media(spark),
        min_matched=AFP_MIN_MATCHED,
        max_hash_ratio=AFP_CAP_RATIO,
    )


def _lm_values() -> str:
    from .media_expected import AUDIO_LANDMARKS

    return ", ".join(f"('{p}', {t}, {h})" for p, t, h in AUDIO_LANDMARKS)


def _afp_dup_oracle(capped: bool) -> str:
    cap_cte = (
        f"""
counts AS (
  SELECT h, COUNT(DISTINCT path) AS n_tr FROM lm GROUP BY h),
lmc AS (
  SELECT lm.* FROM lm JOIN counts USING (h)
  WHERE n_tr <= {AFP_CAP_RATIO} * (SELECT COUNT(DISTINCT path) FROM lm)),
"""
        if capped
        else "lmc AS (SELECT * FROM lm),"
    )
    return f"""
WITH base(path, t, h) AS (VALUES {_lm_values()}),
lm AS (
  SELECT printf('%02d_', j) || path AS path, t, h
  FROM base, (SELECT unnest(range({AFP_DUP_COPIES})) AS j)),
{cap_cte}
votes AS (
  SELECT a.path AS track_a, b.path AS track_b,
         a.t - b.t AS off, COUNT(DISTINCT a.t) AS n
  FROM lmc a JOIN lmc b ON a.h = b.h AND a.path < b.path
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


def batch79_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q323_audio_neardup_dupfamilies",
            q323_audio_neardup_dupfamilies,
            _afp_dup_oracle(capped=False),
            "audio constellation near-dup over 3x duplicate families",
        ),
        QueryDef(
            "q324_audio_neardup_capped",
            q324_audio_neardup_capped,
            _afp_dup_oracle(capped=True),
            "hot-hash-capped audio near-dup vs frozen landmark replay",
        ),
    ]
