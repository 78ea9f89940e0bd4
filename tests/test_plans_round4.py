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


# --------------------------------------------------------------------------
# Statistics tier (q204-q210): the global-rank paths must stay on the
# range-partitioned prefix machinery (no unpartitioned window = no
# one-reducer sort), all-pairs shapes must not appear, and every
# nested-loop join in these plans is a broadcast against a bounded
# (<=64-row or 1-row-aggregate) side. VERDICT r04 #5.
# --------------------------------------------------------------------------


def test_q204_ks_prefix_shape(spark, reg):
    # one prefix pass carries BOTH CDF lanes: the only nested-loop
    # joins are the |partitions|-row offset build and the 1-row grand
    # total inside global_running_sum; no CartesianProduct, no
    # unpartitioned window, and the final cut is a TakeOrdered
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q204_ks_drift")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # offsets + total
    assert not unpartitioned_windows(plan)
    assert "TakeOrderedAndProject" in plan


def test_q205_runs_test_shape(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q205_runs_test")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2
    assert not unpartitioned_windows(plan)


def test_q206_mann_whitney_prefix_shape(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q206_mann_whitney")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # offsets + total
    assert not unpartitioned_windows(plan)


def test_q207_chi2_single_scan(spark, reg):
    # the contingency cells are checkpointed: row totals, column
    # totals, grand total and the join base all read the materialized
    # |types|x7-row table instead of re-running the events scan (the
    # plan shows the checkpoint, not 4 parquet scans); the only
    # nested-loop join is the broadcast 1-row grand total
    plan = plan_of(spark, reg, "q207_chi2_independence")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert plan.count("Scan parquet") <= 1


def test_q208_histogram_states_materialized(spark, reg):
    # the merged 64-row histogram is checkpointed, so the three
    # quantile probes and the cumulative self-join must NOT re-run
    # the documents scan per quantile (was 10 plan-level scans before
    # the checkpoint, <=2 after: the binned pass + the exact-percentile
    # rider); nested-loop joins are all against <=64-row/1-row sides
    plan = plan_of(spark, reg, "q208_mergeable_quantiles")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2


def test_q209_peak_concurrency_shape(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q209_peak_concurrency")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") <= 1
    assert not unpartitioned_windows(plan)


def test_q210_interval_coverage_shape(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q210_interval_coverage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") <= 1
    assert not unpartitioned_windows(plan)
