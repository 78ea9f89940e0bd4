"""JSONL source: typed and all-text reads, missing fields, gzip."""

from __future__ import annotations

import gzip
import json

from pyspark.sql.types import LongType, StringType, StructField, StructType

from postgresimporter_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_all_text,
)

DOCS = [
    {"doc_id": 1, "text": "hello world", "lang": "en"},
    {"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": 7},
    {"doc_id": 3, "text": "no lang field"},
]


def _write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_typed_read_with_explicit_schema(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    _write_jsonl(p, DOCS)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    rows = {r.doc_id: r for r in read_jsonl(spark, [p], schema).collect()}
    assert rows[1].lang == "en"
    assert rows[3].lang is None  # absent field -> null, row not dropped
    assert rows[2].text == "bonjour"  # undeclared 'extra' ignored


def test_all_text_read_pins_strings(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    _write_jsonl(p, DOCS)
    df = read_jsonl_all_text(spark, [p])
    assert dict(df.dtypes)["doc_id"] == "string"
    assert dict(df.dtypes)["extra"] == "string"
    got = {r.doc_id: r.extra for r in df.collect()}
    assert got["2"] == "7"


def test_gzip_jsonl_reads_transparently(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    payload = "\n".join(json.dumps(r) for r in DOCS) + "\n"
    with gzip.open(p, "wt") as f:
        f.write(payload)
    assert read_jsonl_all_text(spark, [p]).count() == 3


def test_multi_file_single_scan(spark, tmp_path):
    a, b = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    _write_jsonl(a, DOCS[:2])
    _write_jsonl(b, DOCS[2:])
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = read_jsonl(spark, [a, b], schema)
    assert df.count() == 3
