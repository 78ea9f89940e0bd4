"""Batch-64: skew split join exactness + plan shape, dynamic
partition pruning plan assertion, and the AMS F2 sketch vs a Python
model."""

from __future__ import annotations

import hashlib

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_skew_split_join_exact_vs_plain_join(spark):
    from postgresimporter_spark.operators.skewjoin import (
        hot_join_keys,
        skew_split_join,
    )

    # key 0 carries half the left rows; 1..9 one row each
    left = spark.createDataFrame(
        [(0, i) for i in range(10)] + [(k, 100 + k) for k in range(1, 10)],
        "k long, v long",
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 12)], "k long, w long"
    )
    got = sorted(
        (r.k, r.v, r.w)
        for r in skew_split_join(left, right, "k", 0.2).collect()
    )
    want = sorted((r.k, r.v, r.w) for r in left.join(right, "k").collect())
    assert got == want
    hot = {r.k: r.n_rows for r in hot_join_keys(left, "k", 0.2).collect()}
    assert hot == {0: 10}


def test_skew_split_join_plan_has_both_legs(spark):
    """With auto-broadcast off, only the operator's explicit hints
    broadcast: the hot leg plans as BroadcastHashJoin while the cold
    leg takes the ordinary shuffle join."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.skewjoin import skew_split_join

    left = spark.range(100).select((F.col("id") % 5).alias("k"), "id")
    right = spark.range(5).withColumnRenamed("id", "k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            skew_split_join(left, right, "k", 0.05)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q303_plan_has_dynamic_pruning(spark, reg):
    df = reg["q303_partition_pruning"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    rows = {r.month: r.n_orders for r in df.collect()}
    assert set(rows) <= {"1995-01", "1995-02", "1995-03"}
    assert sum(rows.values()) > 0


def test_q304_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    li = load_tables(spark, SF, ["lineitem"])["lineitem"]
    freqs = {
        r.l_partkey: r.f
        for r in li.groupBy("l_partkey").count().withColumnRenamed(
            "count", "f"
        ).collect()
    }
    sums = []
    for i in range(16):
        s = 0
        for key, f in freqs.items():
            bit = int(hashlib.md5(f"f2:{i}:{key}".encode()).hexdigest()[0], 16) % 2
            s += f * (1 - 2 * bit)
        sums.append(s)
    est = round(sum(x * x for x in sums) / 16.0, 4)
    exact = sum(f * f for f in freqs.values())
    row = reg["q304_ams_f2"].fn(spark, SF).collect()[0]
    assert row.exact_f2 == exact
    assert row.est_f2 == pytest.approx(est, abs=1e-4)


def test_skew_split_join_degenerate_splits(spark):
    """No-hot-keys (high ratio) and all-hot (every key over a tiny
    ratio) degenerate splits both return the exact plain-join result:
    one leg carries everything, the other is empty, the union is
    unchanged."""
    from postgresimporter_spark.operators.skewjoin import skew_split_join

    left = spark.createDataFrame(
        [(k % 4, k) for k in range(40)], "k long, v long"
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(4)], "k long, w long"
    )
    want = sorted((r.k, r.v, r.w) for r in left.join(right, "k").collect())
    for ratio in (0.99, 0.001):
        got = sorted(
            (r.k, r.v, r.w)
            for r in skew_split_join(left, right, "k", ratio).collect()
        )
        assert got == want


def test_q319_overlap_span_invariants(spark, reg):
    """Every confirmed pair's explanation is internally consistent
    (1 <= longest_run <= n_matched <= n_tokens_a, coverage exact), and
    the constructed exact-dup pairs (doc_id +10000 copies) cover their
    full length in one run."""
    rows = reg["q319_pair_overlap_spans"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_run <= r.n_matched <= r.n_tokens_a
        assert r.coverage == round(r.n_matched / r.n_tokens_a, 6)
    exact = [r for r in rows if r.id_b == r.id_a + 10000]
    assert exact
    for r in exact:
        assert r.n_matched == r.n_tokens_a
        assert r.longest_run == r.n_tokens_a
        assert r.coverage == 1.0


def test_q303_empty_source_returns_zero_rows(spark, reg, tmp_path, monkeypatch):
    """r13 empty-input sweep: a zero-row orders table writes a
    footerless partitioned dir and schema inference failed the read
    (UNABLE_TO_INFER_SCHEMA) — the one crash in a 328-query sweep over
    empty tables. The explicit-schema read keeps it a clean 0-row
    result (and changes no audited plan counter)."""
    sf = tmp_path / "sf_empty"
    sf.mkdir()
    for t in ["orders", "lineitem"]:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(sf / f"{t}.parquet"))
        )
    monkeypatch.setenv(
        "SPARK_GRAFT_DPP_DIR", str(tmp_path / "dpp_cache")
    )
    out = reg["q303_partition_pruning"].fn(spark, str(sf))
    assert out.count() == 0
    assert out.columns == ["month", "n_orders", "total_price"]
