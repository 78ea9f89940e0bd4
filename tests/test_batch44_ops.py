"""Batch-44: reconciliation invariants, clamped-fold and burst-z
property checks against independent Python models, plan pins."""

from __future__ import annotations

import math

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def plan_of(spark, reg, name):
    return physical_plan(reg[name].fn(spark, SF))


# ---------------------------------------------------------------------------
# q227 fact reconciliation
# ---------------------------------------------------------------------------


def test_q227_invariants(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    row = reg["q227_fact_reconciliation"].fn(spark, SF).collect()[0]
    n_orders = load_tables(spark, SF, ["orders"])["orders"].count()
    assert row.n_orders == n_orders
    assert 0 <= row.n_exact <= row.n_within_1c <= row.n_orders
    assert row.max_abs_diff_cents == max(
        abs(row.min_diff_cents), abs(row.max_diff_cents)
    )
    assert row.min_diff_cents <= row.max_diff_cents


def test_q227_single_pass_per_table(spark, reg):
    plan = plan_of(spark, reg, "q227_fact_reconciliation")
    # one scan of orders + one of lineitem, nothing re-read
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q228 clamped running balance vs independent Python fold
# ---------------------------------------------------------------------------


def _python_clamped_balances(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"]
    rows = ev.select("user_id", "ts", "event_id", "event_type", "value").collect()
    per: dict = {}
    for r in rows:
        cents = int(round(float(r.value) * 100))
        d = -cents if r.event_type in ("click", "view") else cents
        per.setdefault(r.user_id, []).append((r.ts, r.event_id, d))
    out = {}
    for uid, evs in per.items():
        bal = 0
        for _, _, d in sorted(evs):
            bal = max(0, bal + d)
        out[uid] = (len(evs), bal)
    return out


def test_q228_matches_python_model(spark, reg):
    model = _python_clamped_balances(spark)
    got = {
        r.user_id: (r.n_events, r.balance_cents)
        for r in reg["q228_clamped_balance"].fn(spark, SF).collect()
    }
    assert got == model


def test_q228_balances_nonnegative(spark, reg):
    for r in reg["q228_clamped_balance"].fn(spark, SF).collect():
        assert r.balance_cents >= 0
        assert r.n_events >= 1


def test_q228_no_window_no_join(spark, reg):
    # the fold is a single groupBy + array fold: one scan, no shuffle-join
    plan = plan_of(spark, reg, "q228_clamped_balance")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q229 node similarity
# ---------------------------------------------------------------------------


def test_q229_jaccard_bounds_and_order(spark, reg):
    rows = reg["q229_node_similarity"].fn(spark, SF).collect()
    assert rows
    prev = None
    for r in rows:
        assert r.part_a < r.part_b
        assert 0 < r.jaccard_micro <= 1_000_000
        assert r.common >= 1
        key = (-r.jaccard_micro, r.part_a, r.part_b)
        if prev is not None:
            assert prev < key
        prev = key


def test_q229_no_allpairs(spark, reg):
    plan = plan_of(spark, reg, "q229_node_similarity")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# q230 burst detection vs independent Python model
# ---------------------------------------------------------------------------


def _python_bursts(spark, win=14, zmin=3.0):
    from collections import Counter

    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"]
    daily = Counter(
        (r.event_type, r.ts.date())
        for r in ev.select("event_type", "ts").collect()
    )
    by_type: dict = {}
    for (et, day), x in daily.items():
        by_type.setdefault(et, []).append((day, x))
    bursts = set()
    for et, series in by_type.items():
        series.sort()
        for i in range(win, len(series)):
            base = [x for _, x in series[i - win : i]]
            s, s2 = sum(base), sum(x * x for x in base)
            var = win * s2 - s * s
            if var <= 0:
                continue
            day, x = series[i]
            z = round((win * x - s) / math.sqrt(var), 6) + 0.0
            if z >= zmin:
                bursts.add((et, day, x, z))
    return bursts


def test_q230_matches_python_model(spark, reg):
    model = _python_bursts(spark)
    got = {
        (r.event_type, r.day, r.x, r.z)
        for r in reg["q230_burst_detection"].fn(spark, SF).collect()
    }
    assert got == model


def test_q230_partitioned_windows_only(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q230_burst_detection")
    assert not unpartitioned_windows(plan)
    assert plan.count("Scan parquet") == 1
