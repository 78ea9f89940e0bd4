"""Batch 60: the rest of the multimodal surface joins the oracle gate
— container-metadata extraction (q288), timeline frame sampling
(q289), and the decode -> resize -> re-encode -> re-parse round trip
(q290).

Same evidence pattern as batch 58: the Spark side runs the LIVE
operators (``extract_media_metadata``, ``sample_frames``,
``resize_media``) over the deterministic seeded corpus
(``operators/mediagen``); the oracle side replays CONSTRUCTION-TRUTH
constants — dimensions, sample rates, frame timings, and durations the
corpus recipe itself chose — which ``tests/gen_media_expected.py``
states by hand from the recipe and refuses to freeze unless the live
operators reproduce them exactly. So the external gate checks real
byte-walking parsers (PNG IHDR, JPEG SOF, RIFF/AVI avih, WAVE fmt,
ISO-BMFF moov, MP3 frame sync) against ground truth that was never
derived from the parsers.

Frame dimensions in q289 are read from the sampled PNG frames with
PURE JVM expressions (substring/hex/conv over the binary IHDR bytes)
— no second decode pass, no Python in the verification path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import QueryDef
from .media_expected import FRAME_SAMPLES, MEDIA_META, RESIZE_META

# q288: container-header metadata ---------------------------------------------


def _all_media(spark: SparkSession) -> DataFrame:
    from ..operators import mediagen as M
    from ..operators.multimodal import MEDIA_SCHEMA

    rows = (
        M.image_corpus()
        + M.audio_corpus()
        + M.video_corpus()
        + M.container_corpus()
    )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def q288_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header metadata for every corpus row across all six container
    formats via the live byte-walking parsers (Arrow-batched
    mapInPandas); unrecognized bytes yield null fields, never task
    failures."""
    from ..operators.multimodal import extract_media_metadata

    return extract_media_metadata(_all_media(spark))


def _sql_v(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return f"'{v}'"
    return repr(v)


def _values(rows) -> str:
    return ", ".join(
        "(" + ", ".join(_sql_v(v) for v in r) + ")" for r in rows
    )


ORACLE_Q288 = (
    "SELECT path, modality, CAST(n_bytes AS BIGINT) AS n_bytes, codec, "
    "CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height, "
    "CAST(sample_rate AS INTEGER) AS sample_rate, "
    "CAST(channels AS INTEGER) AS channels, "
    "CAST(duration_ms AS BIGINT) AS duration_ms FROM (VALUES "
    + _values(MEDIA_META)
    + ") t(path, modality, n_bytes, codec, width, height, sample_rate, "
    "channels, duration_ms)"
)


# q289: timeline frame sampling -------------------------------------------------


def _png_dim(frame: Column, offset: int) -> Column:
    """IHDR width (offset 17) / height (offset 21) of PNG bytes as an
    int — binary substring + hex + conv, all JVM-side."""
    return (
        F.conv(F.hex(F.substring(frame, offset, 4)), 16, 10)
        .cast("int")
    )


def q289_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the mixed corpus at every_ms=400: MJPEG
    AVIs emit the frame actually visible at each offset (re-encoded
    PNG), duration-only media emit frameless offset rows, undecodable
    or timing-less media emit the single offset-0 row. Sampled frame
    dims are read back from the PNG IHDR with pure JVM byte ops."""
    from ..operators import mediagen as M
    from ..operators.multimodal import MEDIA_SCHEMA, sample_frames

    media = spark.createDataFrame(M.frame_sample_corpus(), MEDIA_SCHEMA)
    frames = sample_frames(media, every_ms=M.FRAME_EVERY_MS)
    return frames.select(
        "path",
        "frame_ms",
        F.col("frame").isNotNull().alias("has_frame"),
        F.when(
            F.col("frame").isNotNull(), _png_dim(F.col("frame"), 17)
        ).alias("frame_w"),
        F.when(
            F.col("frame").isNotNull(), _png_dim(F.col("frame"), 21)
        ).alias("frame_h"),
    )


ORACLE_Q289 = (
    "SELECT path, CAST(frame_ms AS BIGINT) AS frame_ms, has_frame, "
    "CAST(frame_w AS INTEGER) AS frame_w, "
    "CAST(frame_h AS INTEGER) AS frame_h FROM (VALUES "
    + _values(FRAME_SAMPLES)
    + ") t(path, frame_ms, has_frame, frame_w, frame_h)"
)


# q290: resize round trip --------------------------------------------------------


def q290_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> nearest-neighbor resize -> re-encode -> re-parse: the
    resized bytes of every decodable image and MJPEG video must parse
    back to the target dimensions with the original video timing
    preserved — the full both-directions codec path under the oracle."""
    from ..operators import mediagen as M
    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_metadata,
        resize_media,
    )

    media = spark.createDataFrame(M.resize_corpus(), MEDIA_SCHEMA)
    resized = resize_media(media, M.RESIZE_W, M.RESIZE_H).select(
        "path", "modality", "content",
        F.lit(None)
        .cast("struct<width:int,height:int,duration_ms:int,codec:string>")
        .alias("meta"),
    )
    return extract_media_metadata(resized).select(
        "path", "modality", "codec", "width", "height", "duration_ms"
    )


ORACLE_Q290 = (
    "SELECT path, modality, codec, CAST(width AS INTEGER) AS width, "
    "CAST(height AS INTEGER) AS height, "
    "CAST(duration_ms AS BIGINT) AS duration_ms FROM (VALUES "
    + _values(RESIZE_META)
    + ") t(path, modality, codec, width, height, duration_ms)"
)


def batch60_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q288_media_metadata",
            q288_media_metadata,
            ORACLE_Q288,
            "six-format container-header metadata vs construction truth",
        ),
        QueryDef(
            "q289_frame_sample",
            q289_frame_sample,
            ORACLE_Q289,
            "MJPEG/GIF timeline frame sampling vs stated frame timings",
        ),
        QueryDef(
            "q290_resize_roundtrip",
            q290_resize_roundtrip,
            ORACLE_Q290,
            "resize -> re-encode -> re-parse round trip vs target dims",
        ),
    ]
