"""Batch-53: correlation matrix / MASE / LTV triangle / conversion
percentiles vs independent Python models at sf0.001."""

from __future__ import annotations

import math

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


# ---------------------------------------------------------------------------
# q260
# ---------------------------------------------------------------------------


def test_q260_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    li = load_tables(spark, SF, ["lineitem"])["lineitem"].collect()
    cols = {
        "quantity": [int(r.l_quantity) for r in li],
        "price_cents": [int(round(r.l_extendedprice * 100)) for r in li],
        "discount_pct": [int(round(r.l_discount * 100)) for r in li],
        "tax_pct": [int(round(r.l_tax * 100)) for r in li],
    }
    n = len(li)
    got = {
        (r.col_a, r.col_b): r.corr
        for r in reg["q260_correlation_matrix"].fn(spark, SF).collect()
    }
    names = list(cols)
    assert len(got) == 6
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            xs, ys = cols[a], cols[b]
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            r = (n * sxy - sx * sy) / math.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            assert got[(a, b)] == round(r, 6) + 0.0
            assert -1 - 1e-9 <= got[(a, b)] <= 1 + 1e-9


def test_q260_single_scan(spark, reg):
    plan = physical_plan(reg["q260_correlation_matrix"].fn(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# q261
# ---------------------------------------------------------------------------


def test_q261_matches_python_model(spark, reg):
    from collections import Counter

    from postgresimporter_spark.sources.parquet import load_tables

    orders = load_tables(spark, SF, ["orders"])["orders"].collect()
    daily = Counter(r.o_orderdate.date() for r in orders)
    ys = [daily[d] for d in sorted(daily)]
    e_season = [abs(ys[i] - ys[i - 7]) for i in range(7, len(ys))]
    e_naive = [abs(ys[i] - ys[i - 1]) for i in range(7, len(ys))]
    row = reg["q261_mase_backtest"].fn(spark, SF).collect()[0]
    assert row.n_days == len(e_season)
    assert row.sae_seasonal == sum(e_season)
    assert row.sae_naive == sum(e_naive)
    assert row.mase == round(sum(e_season) / sum(e_naive), 6) + 0.0


def test_q261_no_unpartitioned_window(spark, reg):
    from test_plans import unpartitioned_windows

    plan = physical_plan(reg["q261_mase_backtest"].fn(spark, SF))
    assert not unpartitioned_windows(plan)


# ---------------------------------------------------------------------------
# q262
# ---------------------------------------------------------------------------


def test_q262_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    orders = load_tables(spark, SF, ["orders"])["orders"].collect()
    first_m: dict = {}
    for r in orders:
        m = r.o_orderdate.date().replace(day=1)
        if r.o_custkey not in first_m or m < first_m[r.o_custkey]:
            first_m[r.o_custkey] = m
    cells = defaultdict(lambda: [set(), 0])
    for r in orders:
        m = r.o_orderdate.date().replace(day=1)
        cm = first_m[r.o_custkey]
        age = (m.year - cm.year) * 12 + (m.month - cm.month)
        cell = cells[(cm, age)]
        cell[0].add(r.o_custkey)
        cell[1] += int(round(r.o_totalprice * 100))
    want = []
    cum: dict = {}
    for (cm, age) in sorted(cells):
        custs, cents = cells[(cm, age)]
        cum[cm] = cum.get(cm, 0) + cents
        want.append((cm, age, len(custs), cents, cum[cm]))
    got = [
        (r.cohort_month, r.age_months, r.n_customers, r.revenue_cents,
         r.cum_ltv_cents)
        for r in reg["q262_ltv_triangle"].fn(spark, SF).collect()
    ]
    assert got == want
    # LTV is cumulative per cohort: non-decreasing along age
    per = {}
    for cm, age, _, _, c in got:
        assert c >= per.get(cm, 0)
        per[cm] = c


# ---------------------------------------------------------------------------
# q263
# ---------------------------------------------------------------------------


def test_q263_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"].collect()
    fv: dict = {}
    fp: dict = {}
    for r in ev:
        if r.event_type == "view":
            fv[r.user_id] = min(fv.get(r.user_id, r.ts), r.ts)
        elif r.event_type == "purchase":
            fp[r.user_id] = min(fp.get(r.user_id, r.ts), r.ts)
    # both engines floor EACH timestamp to whole seconds before
    # subtracting (unix_timestamp / date_diff'second' semantics) —
    # truncating the difference instead is off by one on x.6s gaps
    lats = sorted(
        math.floor(fp[u].timestamp()) - math.floor(fv[u].timestamp())
        for u in fv
        if u in fp and fp[u] >= fv[u]
    )
    N = len(lats)
    want = [
        (q, lats[math.ceil(q / 100 * N) - 1], N) for q in (25, 50, 90)
    ]
    got = [
        (r.percentile, r.latency_sec, r.n_converters)
        for r in reg["q263_time_to_convert"].fn(spark, SF).collect()
    ]
    assert got == want
    assert got[0][1] <= got[1][1] <= got[2][1]
