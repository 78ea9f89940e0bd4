"""Batch-50: FD audit / weighted sample / boxplot / binned MI vs
independent Python models at sf0.001, plus plan pins."""

from __future__ import annotations

import hashlib
import math

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _orders(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    return load_tables(spark, SF, ["orders"])["orders"].collect()


# ---------------------------------------------------------------------------
# q248
# ---------------------------------------------------------------------------


def test_q248_matches_python_model(spark, reg):
    from collections import Counter, defaultdict

    rows = _orders(spark)
    cands = (
        ("o_orderkey->o_custkey", "o_orderkey", "o_custkey"),
        ("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
        ("o_orderpriority->o_orderstatus", "o_orderpriority", "o_orderstatus"),
    )
    got = {r.fd: r for r in reg["q248_fd_audit"].fn(spark, SF).collect()}
    for name, a, b in cands:
        groups = defaultdict(Counter)
        for r in rows:
            groups[str(getattr(r, a))][str(getattr(r, b))] += 1
        viol = sum(len(c) > 1 for c in groups.values())
        g3 = sum(sum(c.values()) - max(c.values()) for c in groups.values())
        r = got[name]
        assert r.n_groups == len(groups)
        assert r.violating_groups == viol
        assert r.g3_rows == g3
        assert r.g3_ratio == round(g3 / len(rows), 6) + 0.0
    # the key FD must hold exactly; the lossy ones must be flagged
    assert got["o_orderkey->o_custkey"].g3_rows == 0
    assert got["o_orderpriority->o_orderstatus"].violating_groups > 0


# ---------------------------------------------------------------------------
# q249
# ---------------------------------------------------------------------------


def test_q249_matches_python_model(spark, reg):
    keys = []
    for r in _orders(spark):
        cents = int(round(r.o_totalprice * 100))
        if cents <= 0:
            continue
        h = int(
            hashlib.md5(f"ws:{r.o_orderkey}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(1 << 60)
        keys.append((math.log(u) / cents, -r.o_orderkey, cents))
    keys.sort(reverse=True)
    want = sorted((-k2, c) for _, k2, c in keys[:50])
    got = [
        (r.o_orderkey, r.cents)
        for r in reg["q249_priority_sample"].fn(spark, SF).collect()
    ]
    assert got == want
    # heavier orders must be overrepresented vs uniform: the sampled
    # mean weight exceeds the population mean
    pop_mean = sum(c for *_, c in keys) / len(keys)
    samp_mean = sum(c for _, c in got) / len(got)
    assert samp_mean > pop_mean


# ---------------------------------------------------------------------------
# q250
# ---------------------------------------------------------------------------


def test_q250_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    parts = load_tables(spark, SF, ["part"])["part"].collect()
    by_brand = defaultdict(list)
    for r in parts:
        by_brand[r.p_brand].append(int(round(r.p_retailprice * 100)))
    got = {r.brand: r for r in reg["q250_boxplot_stats"].fn(spark, SF).collect()}
    assert set(got) == set(by_brand)
    for brand, vals in by_brand.items():
        vals.sort()
        n = len(vals)
        q = lambda f: vals[math.ceil(f * n) - 1]  # noqa: E731
        r = got[brand]
        assert (r.n, r.min_cents, r.max_cents) == (n, vals[0], vals[-1])
        assert (r.q1, r.median, r.q3) == (q(0.25), q(0.5), q(0.75))
        iqr = q(0.75) - q(0.25)
        assert r.iqr == iqr
        lo, hi = q(0.25) - 1.5 * iqr, q(0.75) + 1.5 * iqr
        assert r.n_outliers == sum(v < lo or v > hi for v in vals)
        assert r.min_cents <= r.q1 <= r.median <= r.q3 <= r.max_cents


# ---------------------------------------------------------------------------
# q251
# ---------------------------------------------------------------------------


def test_q251_matches_python_model(spark, reg):
    from collections import Counter

    rows = _orders(spark)
    ranked = sorted(
        (int(round(r.o_totalprice * 100)), r.o_orderkey, r.o_orderpriority)
        for r in rows
    )
    N = len(ranked)
    cells = Counter()
    for i, (_, _, pri) in enumerate(ranked, start=1):
        cells[(math.ceil(10 * i / N), pri)] += 1
    n_i = Counter()
    n_j = Counter()
    for (b, p), v in cells.items():
        n_i[b] += v
        n_j[p] += v
    mi = sum(
        int(round((v / N) * math.log(N * v / (n_i[b] * n_j[p])) * 1e12))
        for (b, p), v in cells.items()
    )
    hb = sum(int(round(-(v / N) * math.log(v / N) * 1e12)) for v in n_i.values())
    hp = sum(int(round(-(v / N) * math.log(v / N) * 1e12)) for v in n_j.values())
    row = reg["q251_rank_binned_mi"].fn(spark, SF).collect()[0]
    assert row.n == N
    assert row.mi_nats == round(mi / 1e12, 6) + 0.0
    assert row.nmi == round(mi / math.sqrt(hb * hp), 6) + 0.0
    assert 0 <= row.nmi <= 1 + 1e-9


def test_q249_q251_plan_shapes(spark, reg):
    from test_plans import unpartitioned_windows

    for name in ("q249_priority_sample", "q251_rank_binned_mi"):
        plan = physical_plan(reg[name].fn(spark, SF))
        assert not unpartitioned_windows(plan)
        assert "CartesianProduct" not in plan
    # the weighted sample is a distributed top-k, not a global sort
    assert "TakeOrderedAndProject" in physical_plan(
        reg["q249_priority_sample"].fn(spark, SF)
    )
