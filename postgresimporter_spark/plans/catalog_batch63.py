"""Batch 63: t-closeness (the third leg of the release-review
governance triple) and video near-duplicate detection via sampled
frame pHashes (the video leg of the multimodal dedup stack).

- q299 t-closeness — Li et al. 2007: per quasi-identifier class, the
  Earth Mover's Distance between the class's sensitive-attribute
  distribution and the global one, over ORDERED bins (EMD over an
  ordered 1-D histogram = mean |cumulative difference|). Joins q166's
  k-anonymity/l-diversity and q264's re-identification risk to
  complete the standard governance audit. Exact integer arithmetic:
  the cumulative-difference sum uses cross-multiplied counts
  (|c_gk·N − C_k·n_g| as BIGINT), one double division at the end.
- q300 video near-dup — frame-aligned perceptual matching: sample
  frames on the shared timeline (q289's machinery), pHash each frame,
  and call two videos near-duplicates when >= MIN_MATCHED aligned
  offsets land within Hamming NEARDUP_R. Candidates come from the MIH
  banded join over (video, offset, hash) fingerprints with an
  offset-equality post-filter — banding is a superset, so exactness
  holds and no all-pairs comparison exists on any path. The oracle
  replays frozen frame hashes (independent FFT-DCT re-derivation in
  tests/gen_media_expected.py) through the same relational logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q299: t-closeness ------------------------------------------------------------

T_BINS = 5
_BIN_W = 2200  # dollars; acctbal spans [-1000, 10000)


def _sens_bin() -> F.Column:
    b = F.floor((F.col("c_acctbal") + F.lit(1000.0)) / F.lit(_BIN_W))
    return F.greatest(
        F.lit(0), F.least(F.lit(T_BINS - 1), b.cast("int"))
    ).alias("bin")


def q299_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (nationkey, mktsegment) class: size and the ordered-bin EMD
    to the global sensitive distribution, in exact cross-multiplied
    integers (one rounded double at the end)."""
    cust = load_tables(spark, sf_dir, ["customer"])["customer"].select(
        "c_nationkey", "c_mktsegment", _sens_bin()
    )
    per = cust.groupBy("c_nationkey", "c_mktsegment", "bin").agg(
        F.count("*").cast("long").alias("c")
    )
    glob = cust.groupBy("bin").agg(F.count("*").cast("long").alias("g"))
    tot = cust.agg(F.count("*").cast("long").alias("N"))
    # dense bin grid per class so zero-count bins still contribute to
    # the cumulative difference
    classes = per.select("c_nationkey", "c_mktsegment").distinct()
    bins = spark.range(T_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = classes.crossJoin(F.broadcast(bins))
    j = (
        grid.join(per, on=["c_nationkey", "c_mktsegment", "bin"], how="left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bin",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
        .join(F.broadcast(glob), on="bin")
        .crossJoin(F.broadcast(tot))
    )
    wp = Window.partitionBy("c_nationkey", "c_mktsegment")
    n_g = F.sum("c").over(wp)
    cum_c = F.sum("c").over(wp.orderBy("bin"))
    cum_g = F.sum("g").over(wp.orderBy("bin"))
    terms = j.select(
        "c_nationkey",
        "c_mktsegment",
        "bin",
        n_g.alias("n_g"),
        (cum_c * F.col("N") - cum_g * F.col("n_g")).alias("_d"),
        F.col("N").alias("N"),
    ).where(F.col("bin") < T_BINS - 1)
    return (
        terms.groupBy("c_nationkey", "c_mktsegment", "n_g", "N")
        .agg(F.sum(F.abs(F.col("_d"))).cast("long").alias("_s"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n_g").cast("long").alias("class_size"),
            (
                F.round(
                    F.col("_s").cast("double")
                    / (
                        F.col("n_g").cast("double")
                        * F.col("N").cast("double")
                        * F.lit(float(T_BINS - 1))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("emd"),
        )
    )


ORACLE_Q299 = f"""
WITH s AS (
  SELECT c_nationkey, c_mktsegment,
         GREATEST(0, LEAST({T_BINS - 1},
           CAST(FLOOR((c_acctbal + 1000.0) / {_BIN_W}) AS INT))) AS bin
  FROM customer),
per AS (
  SELECT c_nationkey, c_mktsegment, bin, COUNT(*) AS c
  FROM s GROUP BY 1, 2, 3),
gl AS (SELECT bin, COUNT(*) AS g FROM s GROUP BY bin),
tot AS (SELECT COUNT(*) AS N FROM s),
grid AS (
  SELECT c_nationkey, c_mktsegment, b.bin
  FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM per)
  CROSS JOIN (SELECT unnest(generate_series(0, {T_BINS - 1})) AS bin) b),
j AS (
  SELECT grid.c_nationkey, grid.c_mktsegment, grid.bin,
         COALESCE(per.c, 0) AS c, gl.g, tot.N
  FROM grid LEFT JOIN per USING (c_nationkey, c_mktsegment, bin)
  JOIN gl ON grid.bin = gl.bin CROSS JOIN tot),
terms AS (
  SELECT c_nationkey, c_mktsegment,
         SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_g,
         SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
                      ORDER BY bin) * N
         - SUM(g) OVER (PARTITION BY c_nationkey, c_mktsegment
                        ORDER BY bin)
           * SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS d,
         N, bin
  FROM j)
SELECT c_nationkey, c_mktsegment,
       CAST(n_g AS BIGINT) AS class_size,
       ROUND(SUM(ABS(d)) / (CAST(n_g AS DOUBLE) * N * {T_BINS - 1}), 6)
         + 0.0 AS emd
FROM terms WHERE bin < {T_BINS - 1}
GROUP BY c_nationkey, c_mktsegment, n_g, N
"""


# q300: video near-dup via aligned frame pHashes --------------------------------

VID_MAX_HAMMING = 10
VID_MIN_MATCHED = 2


def q300_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate videos over the seeded corpus: live sampler ->
    frame pHash -> MIH banded join -> aligned-offset match counting
    (operators/imagehash.video_neardup_pairs). The oracle replays the
    independently-derived frozen frame hashes through the same
    relational definition, so the whole decode -> sample -> hash ->
    match chain is externally checked."""
    from ..operators.imagehash import video_neardup_pairs
    from ..operators.mediagen import FRAME_EVERY_MS, video_neardup_corpus
    from ..operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(video_neardup_corpus(), MEDIA_SCHEMA)
    return video_neardup_pairs(
        media,
        every_ms=FRAME_EVERY_MS,
        max_hamming=VID_MAX_HAMMING,
        min_matched=VID_MIN_MATCHED,
    )


def _vid_oracle() -> str:
    from .media_expected import VIDEO_FRAME_PHASH

    vals = ", ".join(
        f"('{p}', {ms}, {h})" for p, ms, h in VIDEO_FRAME_PHASH
    )
    return f"""
WITH fp(path, frame_ms, phash) AS (VALUES {vals})
SELECT LEAST(a.path, b.path) AS video_a,
       GREATEST(a.path, b.path) AS video_b,
       CAST(COUNT(DISTINCT a.frame_ms) AS BIGINT) AS n_matched
FROM fp a JOIN fp b
  ON a.frame_ms = b.frame_ms AND a.path < b.path
WHERE bit_count(xor(a.phash, b.phash)) <= {VID_MAX_HAMMING}
GROUP BY 1, 2
HAVING COUNT(DISTINCT a.frame_ms) >= {VID_MIN_MATCHED}
"""


def batch63_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q299_t_closeness",
            q299_t_closeness,
            ORACLE_Q299,
            "ordered-bin EMD t-closeness per quasi-identifier class",
        ),
        QueryDef(
            "q300_video_neardup",
            q300_video_neardup,
            _vid_oracle(),
            "aligned-frame perceptual video near-dup vs frozen frame hashes",
        ),
    ]
