"""Recipe-runner tests: the config-driven pipeline must reproduce the
hand-written q138 composition byte-for-byte, round-trip through JSON,
and fail fast on bad configs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from postgresimporter_spark.operators.recipes import run_recipe
from postgresimporter_spark.plans.catalog_batch21 import (
    BUILD_QUOTA,
    BUILD_WEIGHTS,
)
from postgresimporter_spark.sources.parquet import load_tables

SF = "/root/testdata/sf0.001"


def _aug_docs(spark):
    docs = load_tables(spark, SF, ["documents"])["documents"]
    return docs.select("doc_id", "text", "source").unionByName(
        docs.where(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text", "source"
        )
    )


def test_recipe_reproduces_q138_composition(spark):
    from postgresimporter_spark.plans.catalog_batch21 import (
        q138_corpus_build,
    )

    manual = {
        (r["doc_id"], r["source"], r["epoch"])
        for r in q138_corpus_build(spark, SF).collect()
    }
    # same pipeline, declared as data — through a JSON round trip, the
    # way a reviewed config actually arrives
    recipe = json.loads(
        json.dumps(
            [
                {"stage": "exact_dedup"},
                {"stage": "quality_gates"},
                {"stage": "source_quota", "max_per_group": BUILD_QUOTA},
                {"stage": "mixture", "weights": BUILD_WEIGHTS},
            ]
        )
    )
    got = {
        (r["doc_id"], r["source"], r["epoch"])
        for r in run_recipe(_aug_docs(spark), recipe).collect()
    }
    assert got == manual and len(got) > 0


def test_recipe_text_stages_chain(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "Contact me at bob@example.com for the details today.\n"
                "too short",
                "src0",
            )
        ],
        ["doc_id", "text", "source"],
    )
    out = run_recipe(
        df,
        [{"stage": "line_filter"}, {"stage": "pii_redact"}],
    ).collect()
    assert len(out) == 1
    text = out[0]["text"]
    assert "too short" not in text  # line filter dropped it
    assert "bob@example.com" not in text  # then redaction masked PII


def test_recipe_validation(spark):
    df = spark.createDataFrame([(1, "t", "s")], ["doc_id", "text", "source"])
    with pytest.raises(ValueError, match="unknown stage"):
        run_recipe(df, [{"stage": "nope"}])
    with pytest.raises(ValueError, match="final stage"):
        run_recipe(
            df,
            [
                {"stage": "mixture", "weights": {"s": 100}},
                {"stage": "exact_dedup"},
            ],
        )
    with pytest.raises(ValueError, match="at least one"):
        run_recipe(df, [])


def test_recipe_minhash_dedup_keeps_cluster_minimum(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base, "s"), (2, base, "s"), (3, "totally different words here now ok fine yes", "s")],
        ["doc_id", "text", "source"],
    )
    out = sorted(
        r["doc_id"]
        for r in run_recipe(
            df, [{"stage": "minhash_dedup", "threshold": 0.8}]
        ).collect()
    )
    assert out == [1, 3]  # 2 lost to 1; 3 untouched


def test_query_cli_name_resolution(spark, capsys):
    from postgresimporter_spark.query import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "q170" in out

    assert main(["q23", "--sf", SF]) == 0
    assert "lineitem" in capsys.readouterr().out

    assert main(["q2"]) == 1  # ambiguous prefix
    assert "ambiguous" in capsys.readouterr().err
    assert main(["zzz"]) == 1
