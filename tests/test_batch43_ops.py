"""Batch-43: decomposition identity, TF-IDF symmetry, plan pins."""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def plan_of(spark, reg, name):
    return physical_plan(reg[name].fn(spark, SF))


def test_q225_additive_identity(spark, reg):
    # x*1e6 == trend + seasonal + remainder EXACTLY on every row —
    # the decomposition is additive by construction, integer math
    rows = reg["q225_seasonal_decompose"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r.x * 1_000_000
            == r.trend_micro + r.seasonal_micro + r.remainder_micro
        )


def test_q224_self_similarity_bounds(spark, reg):
    rows = reg["q224_sparse_cosine_pairs"].fn(spark, SF).collect()
    for r in rows:
        assert 0.5 <= r.cosine <= 1.000001
        assert r.id_a < r.id_b


def test_q226_ratio_bounds(spark, reg):
    rows = reg["q226_lexical_diversity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_hapax <= r.n_types <= r.n_tokens
        assert 0 < r.ttr_micro <= 1_000_000
        assert 0 <= r.hapax_micro <= 1_000_000


def test_q224_no_allpairs(spark, reg):
    plan = plan_of(spark, reg, "q224_sparse_cosine_pairs")
    assert "CartesianProduct" not in plan
    # the 1-row corpus-size broadcast is the only permitted BNLJ
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q225_partitioned_windows_only(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q225_seasonal_decompose")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not unpartitioned_windows(plan)


def test_q226_single_scan(spark, reg):
    plan = plan_of(spark, reg, "q226_lexical_diversity")
    assert plan.count("Scan parquet") <= 1
    assert "Join" not in plan
