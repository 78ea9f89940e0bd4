"""JSON-Lines ingestion — the interchange format LLM document corpora
actually ship in (one JSON object per line: `{"text": ..., "meta": ...}`).

Net-new beyond the reference (which ingests only zipped CSVs): the same
all-text contract as ``sources/csv.py`` extended to JSONL, plus a typed
reader for known document schemas.

Scale notes:

* A path-list read is ONE distributed scan; line-delimited JSON splits
  by line across executors (unlike multiline JSON, which forces one
  task per file — never use ``multiLine`` for corpus-scale data).
* Schema inference samples the data with an extra pass and can flip
  types between runs as data drifts; at 100 TB always pass an explicit
  schema (``read_jsonl``) or use the all-text mode
  (``read_jsonl_all_text``: ``primitivesAsString`` pins every scalar to
  string — the CSV loader's contract, so downstream typed-parse
  functions behave identically for both formats).
* gzip/zstd-compressed ``.jsonl.gz``/``.jsonl.zst`` files decode
  transparently, but gzip is not splittable — one task per file; prefer
  many medium files (or zstd with a seekable frame layout) at scale.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    paths: list[str | Path],
    schema: StructType,
) -> DataFrame:
    """Typed JSONL read with an explicit schema (the scale posture —
    zero inference passes, stable types). Fields absent in a line are
    null; unparseable lines surface in ``_corrupt_record`` if the
    schema declares it, else the malformed fields are null."""
    return spark.read.schema(schema).json([str(p) for p in paths])


def read_jsonl_all_text(
    spark: SparkSession,
    paths: list[str | Path],
) -> DataFrame:
    """All-text JSONL read: every scalar arrives as a string column
    (``primitivesAsString``), mirroring the all-text CSV contract so
    the pipeline's typed-parse stage (functions/timestamps.py etc.)
    applies uniformly. Uses inference for column NAMES only — pin a
    schema via ``read_jsonl`` when the field set is known."""
    return (
        spark.read.option("primitivesAsString", "true")
        .json([str(p) for p in paths])
    )


__all__ = ["read_jsonl", "read_jsonl_all_text"]
