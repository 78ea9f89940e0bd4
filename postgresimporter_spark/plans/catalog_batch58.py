"""Batch 58: the multimodal tier joins the oracle gate — perceptual
image hashing (q280), banded image near-dup (q281), PCM audio
spectral features (q282) — plus the SimHash hot-band skew cap under
external verification (q283).

q280-q282 close the round-6 verdict's only "weak" grade: the
imagehash/audiofeat operator families were pytest-tested but invisible
to the driver's differential-oracle sweep. DuckDB cannot decode PNG
bytes or run an FFT, so the oracle side replays FROZEN expected values
(``plans/media_expected.py``) that ``tests/gen_media_expected.py``
re-derives with independent numerical models (FFT-based DCT vs the
operator's cosine matmul; stdlib ``wave`` vs the byte-walking RIFF
parser) and refuses to write on any disagreement. The Spark side runs
the LIVE operators on the deterministic corpus
(``operators/mediagen``), so every round the driver checks the whole
decode -> DCT/FFT -> hash/feature -> (banded join) chain against the
independently-derived constants.

q283 exercises ``max_band_ratio``/``hot_bands()`` (the round-5 skew
guard, previously unit-tested only): a deliberately skewed corpus —
documents plus a 60x-replicated boilerplate block — where the oracle
replicates banding, band-frequency capping, AND the drop-report in
pure SQL, so the cap's exactness-below-the-cap and its no-silent-drop
accounting are both externally verified (same pattern as q81's
Jaccard hot-shingle cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources.parquet import load_tables
from .catalog import QueryDef
from .catalog_batch8 import HAMMING_BITS
from .media_expected import AUDIO_FEATURES, IMAGE_PHASH

# q280/q281: image pHash + banded near-dup ----------------------------------


def _media_images(spark: SparkSession) -> DataFrame:
    from ..operators.mediagen import image_corpus
    from ..operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(image_corpus(), MEDIA_SCHEMA)


def q280_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash of every corpus image via the live decode ->
    32x32 resample -> DCT -> median-threshold chain (Arrow-batched
    mapInPandas, operators/imagehash.py); undecodable rows surface as
    NULL hashes (log-and-continue), never failures. The oracle replays
    independently-derived frozen hashes."""
    from ..operators.imagehash import image_phash

    return image_phash(_media_images(spark)).select(
        F.col("id").alias("path"), "phash"
    )


def _sql_img(h) -> str:
    return "NULL" if h is None else str(h)


ORACLE_Q280 = (
    "SELECT path, CAST(phash AS BIGINT) AS phash FROM (VALUES "
    + ", ".join(f"('{p}', {_sql_img(h)})" for p, h in IMAGE_PHASH)
    + ") t(path, phash)"
)


NEARDUP_MAX_HAMMING = 10


def q281_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: pHash + the banded exact Hamming
    join, pinned to ``method="combo"`` (pigeonhole combo keys over 16
    4-bit chunks — the large-combo LOOKUP path in dedup._combo_keyed,
    C(16,6)=8008 hashed 24-bit keys) so that path keeps an external
    oracle row; the faster MIH default is oracle-covered by
    q284/q291 and benched by img_neardup_450. Exact by construction,
    so the oracle can brute-force all pairs over the frozen hashes —
    any banding recall loss shows up as a missing row."""
    from ..operators.imagehash import image_neardup_pairs

    return image_neardup_pairs(
        _media_images(spark),
        max_hamming=NEARDUP_MAX_HAMMING,
        method="combo",
    )


ORACLE_Q281 = (
    "WITH h(path, phash) AS (VALUES "
    + ", ".join(f"('{p}', {_sql_img(h)})" for p, h in IMAGE_PHASH)
    + f""")
SELECT a.path AS id_a, b.path AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM h a JOIN h b ON a.path < b.path
WHERE a.phash IS NOT NULL AND b.phash IS NOT NULL
  AND bit_count(xor(a.phash, b.phash)) <= {NEARDUP_MAX_HAMMING}"""
)


# q282: audio spectral features ----------------------------------------------


def q282_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral/time features of every corpus WAV via the live RIFF
    parse -> Hann rFFT chain (operators/audiofeat.py); non-PCM rows
    (mp3 bytes, IEEE-float WAV) surface as NULL feature columns — the
    multimodal honesty boundary under external verification."""
    from ..operators.audiofeat import extract_audio_features
    from ..operators.mediagen import audio_corpus
    from ..operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(audio_corpus(), MEDIA_SCHEMA)
    return extract_audio_features(media)


def _sql_num(v) -> str:
    return "NULL" if v is None else repr(v)


ORACLE_Q282 = (
    "SELECT path, CAST(duration_ms AS BIGINT) AS duration_ms, "
    "CAST(sample_rate AS BIGINT) AS sample_rate, "
    "CAST(rms AS DOUBLE) AS rms, "
    "CAST(zero_crossing_rate AS DOUBLE) AS zero_crossing_rate, "
    "CAST(spectral_centroid_hz AS DOUBLE) AS spectral_centroid_hz, "
    "CAST(spectral_rolloff_hz AS DOUBLE) AS spectral_rolloff_hz, "
    "CAST(spectral_bandwidth_hz AS DOUBLE) AS spectral_bandwidth_hz "
    "FROM (VALUES "
    + ", ".join(
        "('" + r[0] + "', " + ", ".join(_sql_num(v) for v in r[1:]) + ")"
        for r in AUDIO_FEATURES
    )
    + ") t(path, duration_ms, sample_rate, rms, zero_crossing_rate, "
    "spectral_centroid_hz, spectral_rolloff_hz, spectral_bandwidth_hz)"
)


# q283: SimHash hot-band cap under the oracle --------------------------------

BOILER_TEXT = (
    "terms of service boilerplate repeated verbatim across mirror sites "
    "all rights reserved contact the webmaster for details"
)
BOILER_N = 60
CAP_RATIO = 0.05
CAP_CHUNKS = 4
CAP_MAX_HAMMING = 2


def q283_simhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the hot-band skew cap: documents plus a 60x
    boilerplate block (every replica shares one fingerprint, so all
    its combo-band keys exceed 5% of the corpus and are dropped
    pre-join). Returns the uncapped vs capped pair counts plus the
    ``hot_bands()`` drop-report aggregate — the oracle rebuilds
    banding, the frequency cap, and the drop report in SQL, so
    exactness-over-surviving-bands and the no-silent-drop accounting
    are both checked."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    boiler = spark.range(BOILER_N).select(
        (F.col("id") + 20000).alias("doc_id"),
        F.lit(BOILER_TEXT).alias("text"),
    )
    skewed = docs.select("doc_id", "text").unionByName(boiler)
    fps = D.simhash(skewed, bits=HAMMING_BITS)
    kw = dict(
        bits=HAMMING_BITS, chunks=CAP_CHUNKS, max_hamming=CAP_MAX_HAMMING
    )
    uncapped = D.simhash_hamming_pairs(fps, **kw)
    capped = D.simhash_hamming_pairs(fps, max_band_ratio=CAP_RATIO, **kw)
    hot = D.hot_bands(fps, CAP_RATIO, **kw)
    n_unc = uncapped.agg(
        F.count("*").cast("long").alias("n_pairs_uncapped")
    )
    n_cap = capped.agg(F.count("*").cast("long").alias("n_pairs_capped"))
    n_hot = hot.agg(
        F.count("*").cast("long").alias("n_hot_keys"),
        F.coalesce(F.max("n_fingerprints"), F.lit(0))
        .cast("long")
        .alias("hot_fps_max"),
    )
    return n_unc.crossJoin(F.broadcast(n_cap)).crossJoin(F.broadcast(n_hot))


def _skewed_simhash_cte() -> str:
    """DuckDB replica of ``D.simhash`` over the skewed corpus — same
    md5 token hash and vote fold the driver-green q86/q231 oracles
    pin, with the boilerplate block appended."""
    from .catalog_batch8 import HAMMING_BITS as B

    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(B)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(B)
    )
    return f"""
skewed AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT 20000 + i AS doc_id, '{BOILER_TEXT}' AS text
  FROM range({BOILER_N}) t(i)),
toks AS (SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+'))
         AS tok FROM skewed),
h AS (SELECT id, ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS h
      FROM toks),
v AS (SELECT id, {votes} FROM h GROUP BY id),
sh AS (SELECT id, CAST({fp} AS BIGINT) AS simhash FROM v)
"""


_WIDTH = HAMMING_BITS // CAP_CHUNKS  # 8-bit chunks
# itertools.combinations(range(4), 2) order — must mirror _combo_keyed
_COMBOS = "(VALUES (0,0,1), (1,0,2), (2,0,3), (3,1,2), (4,1,3), (5,2,3))"

ORACLE_Q283 = f"""
WITH {_skewed_simhash_cte()},
kv AS (
  SELECT id, simhash, c.ci,
         (simhash >> ({_WIDTH} * c.i0)) & {(1 << _WIDTH) - 1} AS v0,
         (simhash >> ({_WIDTH} * c.i1)) & {(1 << _WIDTH) - 1} AS v1
  FROM sh CROSS JOIN {_COMBOS} c(ci, i0, i1)),
tot AS (SELECT COUNT(*) AS n FROM sh),
freq AS (SELECT ci, v0, v1, COUNT(*) AS f FROM kv GROUP BY ci, v0, v1),
hot AS (SELECT ci, v0, v1, f FROM freq CROSS JOIN tot
        WHERE f > CAST({CAP_RATIO} AS DOUBLE) * n),
coldkv AS (SELECT kv.* FROM kv LEFT JOIN hot
           USING (ci, v0, v1) WHERE hot.f IS NULL),
capped AS (
  SELECT DISTINCT a.id AS ia, b.id AS ib
  FROM coldkv a JOIN coldkv b
    ON a.ci = b.ci AND a.v0 = b.v0 AND a.v1 = b.v1 AND a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {CAP_MAX_HAMMING}),
uncapped AS (
  SELECT a.id AS ia, b.id AS ib FROM sh a JOIN sh b ON a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {CAP_MAX_HAMMING})
SELECT CAST((SELECT COUNT(*) FROM uncapped) AS BIGINT) AS n_pairs_uncapped,
       CAST((SELECT COUNT(*) FROM capped) AS BIGINT) AS n_pairs_capped,
       CAST((SELECT COUNT(*) FROM hot) AS BIGINT) AS n_hot_keys,
       CAST((SELECT COALESCE(MAX(f), 0) FROM hot) AS BIGINT) AS hot_fps_max
"""


def batch58_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q280_image_phash",
            q280_image_phash,
            ORACLE_Q280,
            "perceptual image hash (DCT pHash) vs independently-derived frozen hashes",
        ),
        QueryDef(
            "q281_image_neardup",
            q281_image_neardup,
            ORACLE_Q281,
            "banded image near-dup pairs vs brute-force Hamming oracle",
        ),
        QueryDef(
            "q282_audio_features",
            q282_audio_features,
            ORACLE_Q282,
            "PCM audio spectral features vs independently-derived frozen values",
        ),
        QueryDef(
            "q283_simhash_capped",
            q283_simhash_capped,
            ORACLE_Q283,
            "SimHash hot-band cap: capped pairs + drop report vs full SQL replica",
        ),
    ]
