"""All-text CSV ingestion (reference semantics: pgfutter loads every
column as ``text``, header row names the columns — README.md:91-92).

Scale note: one ``spark.read.csv`` over a *list of paths* produces a
single distributed scan whose input splits parallelize across executors —
the Spark-native analog of the reference's one-subprocess-per-file fan-out
(main.py:491-542), but with no per-file process cost and free column
pruning/pushdown from Catalyst.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def read_csv_all_text(
    spark: SparkSession,
    paths: list[str | Path] | str | Path,
    encoding: str | None = None,
) -> DataFrame:
    """Read CSV file(s) with the header as column names, all columns
    StringType (``inferSchema`` off is Spark's default — it matches the
    reference's untyped ingest exactly)."""
    if isinstance(paths, (str, Path)):
        paths = [paths]
    reader = (
        spark.read.option("header", "true")
        # Quoted embedded newlines parse correctly (strictly better than
        # the reference's wc -l fast path; SURVEY §2.1 S10).
        .option("multiLine", "true")
        .option("escape", '"')
    )
    if encoding:
        reader = reader.option("encoding", encoding)
    return reader.csv([str(p) for p in paths])


def read_csv_group(
    spark: SparkSession, files: list[Path], strict_schema: bool = True
) -> DataFrame:
    """Read a prefix group of CSVs as ONE scan (the combine operator O1).

    The reference combines per-file Postgres tables with
    ``CREATE TABLE ... (LIKE first) INCLUDING ALL`` + ``UNION ALL``
    (main.py:215-248); schema mismatches fail ("column does not exist",
    main.py:247). Planning the union as a single multi-path scan instead
    of N union nodes is our SURVEY §4.2 rewrite: one scan, no union
    operators in the plan, file-level parallelism for free.

    ``strict_schema`` reproduces the reference's LIKE-first-file check:
    every file's header must equal the first file's header.
    """
    if strict_schema and len(files) > 1:
        first = _header(files[0])
        for f in files[1:]:
            cols = _header(f)
            if cols is not None and first is not None and cols != first:
                raise ValueError(
                    f"schema mismatch combining {f}: {cols} != {first} "
                    "(reference LIKE-first-file semantics, main.py:247)"
                )
    return read_csv_all_text(spark, files)


def _header(path: str | Path) -> list[str] | None:
    """First-line header via direct IO — no Spark job per file (a
    per-file spark.read just to compare headers serializes N job setups
    on the driver). Non-local paths return None (check skipped; the
    union read will still fail on column-count mismatch)."""
    import csv as _csv

    try:
        with open(path, newline="") as fh:
            return next(_csv.reader(fh))
    except (OSError, StopIteration):
        return None
