"""XML source/sink on Spark 4's built-in XML data source.

Same contract family as ``sources/csv.py`` / ``sources/jsonl.py``:
a typed read (schema inference or explicit schema) and an all-text
read matching the reference's all-``text`` CSV load discipline
(reference postgresimporter/import.sh loads every column as text;
see SURVEY §2 S4).  Distributed parse: each file splits into row-tag
records executor-side — no driver-side XML handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | None = None,
) -> DataFrame:
    """Typed XML read: one DataFrame row per ``<row_tag>`` element,
    schema inferred unless given."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_xml_all_text(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    columns: list[str] | None = None,
) -> DataFrame:
    """All-text XML read (the bulk-load posture: parse nothing, load
    everything as string, let downstream SQL cast).  Column list is
    taken from a schema-inference pass unless provided."""
    if columns is None:
        columns = read_xml(spark, path, row_tag).columns
    schema = StructType(
        [StructField(c, StringType(), True) for c in columns]
    )
    return read_xml(spark, path, row_tag, schema)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Partition-parallel XML write (one file per partition)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
