"""Plan-shape regressions for the web-curation tier (batch 22)."""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.bucketing import (
    count_exchanges,
    physical_plan,
)
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_q140_canonicalize_is_pure_projection(spark, reg):
    """URL canonicalization must stay a zero-shuffle codegen'd map over
    the scan (plus the final presentation sort's single exchange)."""
    df = reg["q140_url_canonicalize"].fn(spark, SF)
    # only the ORDER BY doc_id presentation sort may exchange
    assert count_exchanges(df) <= 1
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # doc_id filter pushed to the parquet scan
    assert "LessThan(doc_id,60)" in plan


def test_q141_windows_are_partitioned(spark, reg):
    """Both dedup/cap windows must partition (canonical_url, domain) —
    an unpartitioned window here would serialize the corpus."""
    from test_plans import unpartitioned_windows

    df = reg["q141_domain_quota"].fn(spark, SF)
    plan = physical_plan(df)
    assert "Window" in plan
    assert unpartitioned_windows(plan) == []
    assert "BatchEvalPython" not in plan
