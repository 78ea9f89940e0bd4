"""Batch-46: OLS/Zipf/log-odds/JS checked against independent Python
models at sf0.001, plus plan pins."""

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


def _ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    inum = sy * sxx - sx * sxy
    return cov, varx, vary, inum


def _tok_rows(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"]
    return [
        (r.source, r.text.strip().split())
        for r in docs.select("source", "text").collect()
    ]


# ---------------------------------------------------------------------------
# q232
# ---------------------------------------------------------------------------


def test_q232_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    part = load_tables(spark, SF, ["part"])["part"].collect()
    by_brand: dict = {}
    for r in part:
        y = int(round(r.p_retailprice * 100))
        by_brand.setdefault(r.p_brand, []).append((r.p_size, y))
    got = {r.brand: r for r in reg["q232_groupwise_ols"].fn(spark, SF).collect()}
    assert set(got) == set(by_brand)
    for brand, pts in by_brand.items():
        cov, varx, vary, inum = _ols(pts)
        r = got[brand]
        assert r.n == len(pts)
        if varx > 0:
            assert r.slope_cents_per_size == round(cov / varx, 6) + 0.0
            assert r.intercept_cents == round(inum / varx, 4) + 0.0
            if vary > 0:
                assert r.r2 == round((cov * cov) / (varx * vary), 6) + 0.0
        else:
            assert r.slope_cents_per_size is None


def test_q232_single_scan_no_join(spark, reg):
    plan = plan_of(spark, reg, "q232_groupwise_ols")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# q233
# ---------------------------------------------------------------------------


def test_q233_matches_python_model(spark, reg):
    from collections import Counter

    freq = Counter()
    for _, toks in _tok_rows(spark):
        freq.update(toks)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    pts = [
        (
            int(round(math.log(i + 1) * 1e6)),
            int(round(math.log(f) * 1e6)),
        )
        for i, (_, f) in enumerate(top)
    ]
    cov, varx, vary, inum = _ols(pts)
    row = reg["q233_zipf_fit"].fn(spark, SF).collect()[0]
    assert row.n == len(pts)
    assert row.zipf_slope == round(cov / varx, 6) + 0.0
    assert row.r2 == round((cov * cov) / (varx * vary), 6) + 0.0
    assert row.zipf_slope < 0  # frequency decays with rank
    assert 0 < row.r2 <= 1.000001


def test_q233_no_unpartitioned_window(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q233_zipf_fit")
    assert not unpartitioned_windows(plan)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no sort-all


# ---------------------------------------------------------------------------
# q234
# ---------------------------------------------------------------------------


def _group_counts(spark):
    from collections import Counter

    na, nb = Counter(), Counter()
    a_srcs = {f"src{i}" for i in range(10)}
    for src, toks in _tok_rows(spark):
        (na if src in a_srcs else nb).update(toks)
    return na, nb


def test_q234_matches_python_model(spark, reg):
    na, nb = _group_counts(spark)
    vocab = set(na) | set(nb)
    NA, NB, V = sum(na.values()), sum(nb.values()), len(vocab)
    scored = []
    for t in vocab:
        a, b = na[t], nb[t]
        delta = math.log((a + 1) / (NA + V - a - 1)) - math.log(
            (b + 1) / (NB + V - b - 1)
        )
        z = delta / math.sqrt(1 / (a + 1) + 1 / (b + 1))
        scored.append((round(z, 6) + 0.0, t, a, b, round(delta, 6) + 0.0))
    scored.sort(key=lambda s: (-s[0], s[1]))
    want = [(t, a, b, d, z) for z, t, a, b, d in scored[:25]]
    got = [
        (r.token, r.na, r.nb, r.delta, r.z)
        for r in reg["q234_log_odds"].fn(spark, SF).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# q235
# ---------------------------------------------------------------------------


def test_q235_matches_python_model_and_bounds(spark, reg):
    na, nb = _group_counts(spark)
    vocab = set(na) | set(nb)
    NA, NB = sum(na.values()), sum(nb.values())
    s = 0
    for t in vocab:
        p, q = na[t] / NA, nb[t] / NB
        m = (p + q) / 2
        c = 0.0
        if na[t] > 0:
            c += p * math.log(p / m)
        if nb[t] > 0:
            c += q * math.log(q / m)
        s += int(round(c * 0.5 * 1e12))
    row = reg["q235_jensen_shannon"].fn(spark, SF).collect()[0]
    assert (row.tokens_a, row.tokens_b, row.vocab) == (NA, NB, len(vocab))
    assert row.js_nats == round(s / 1e12, 6) + 0.0
    assert 0 <= row.js_nats <= math.log(2) + 1e-9
    assert 0 <= row.js_bits <= 1 + 1e-9


def test_q234_q235_broadcast_totals_only(spark, reg):
    for name in ("q234_log_odds", "q235_jensen_shannon"):
        plan = plan_of(spark, reg, name)
        assert "CartesianProduct" not in plan
        # the 1-row totals broadcast is the only permitted BNLJ
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        assert plan.count("Scan parquet") <= 2
