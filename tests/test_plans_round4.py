"""Physical-plan regression tests for the round-4 tiers: the scale
claims (single-pass scans, equi-join candidate generation, ordered
cuts) held as assertions, mirroring test_plans.py."""

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


def test_q183_single_scan_for_all_polygons(spark, reg):
    # the containment fold runs once per row for ALL polygons (array
    # explode), never one scan per polygon
    plan = plan_of(spark, reg, "q183_point_in_polygon")
    assert plan.count("Scan parquet") == 1
    assert "CartesianProduct" not in plan


def test_q194_single_lineitem_scan(spark, reg):
    # the checkpointed basket table feeds supports AND pairs: one
    # lineitem scan total (the review-pass fix, pinned)
    plan = plan_of(spark, reg, "q194_association_rules")
    assert plan.count("Scan parquet") <= 1


def test_q191_synopsis_is_take_ordered(spark, reg):
    # each side's k-min cut is a TakeOrdered (per-partition heaps),
    # never a global sort
    plan = plan_of(spark, reg, "q191_kmv_join_estimate")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q203_skyline_no_allpairs(spark, reg):
    # the sweep formulation must never fall back to an all-pairs
    # dominance join: the frontier attaches via a HASH equi-join on
    # (price, size). (A BroadcastNestedLoopJoin does appear once — the
    # |partitions|-row offset build INSIDE global_running_max, which
    # is metadata-scale by construction — so the assertion targets the
    # data-scale joins specifically.)
    plan = plan_of(spark, reg, "q203_skyline")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # offsets only
    assert "BroadcastHashJoin [price_cents" in plan


def test_q179_variant_equi_join(spark, reg):
    # SymSpell candidates come from a hash equi-join on the variant
    # string, not a theta/nested-loop join
    plan = plan_of(spark, reg, "q179_symspell")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
