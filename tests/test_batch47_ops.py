"""Batch-47: Kendall tau / Poisson bootstrap / Lloyd step / info gain
checked against independent Python models at sf0.001, plus plan pins."""

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


def plan_of(spark, reg, name):
    return physical_plan(reg[name].fn(spark, SF))


def _orders(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    return load_tables(spark, SF, ["orders"])["orders"].collect()


# ---------------------------------------------------------------------------
# q236
# ---------------------------------------------------------------------------


def test_q236_matches_python_model(spark, reg):
    rev = {}
    for r in _orders(spark):
        y = r.o_orderdate.year
        if y in (1995, 1996):
            k = (r.o_custkey, y)
            rev[k] = rev.get(k, 0) + int(round(r.o_totalprice * 100))
    common = sorted(
        (
            (-rev[(c, 1995)], c)
            for (c, y) in rev
            if y == 1995 and (c, 1996) in rev
        )
    )[:100]
    top = [(c, rev[(c, 1995)], rev[(c, 1996)]) for _, c in common]
    C = D = ta = tb = 0
    for i in range(len(top)):
        for j in range(i + 1, len(top)):
            a, b = top[i], top[j]
            pa, pb = (c1 for c1 in ()), None  # noqa: F841 - clarity below
            da, db = a[1] - b[1], a[2] - b[2]
            if a[0] > b[0]:  # enforce custkey_a < custkey_b orientation
                da, db = -da, -db
            prod = da * db
            C += prod > 0
            D += prod < 0
            ta += da == 0
            tb += db == 0
    n = len(top) * (len(top) - 1) // 2
    row = reg["q236_kendall_tau"].fn(spark, SF).collect()[0]
    assert (row.n_pairs, row.concordant, row.discordant) == (n, C, D)
    assert (row.ties_a, row.ties_b) == (ta, tb)
    assert row.tau_a == round((C - D) / n, 6) + 0.0
    assert -1 <= row.tau_a <= 1


def test_q236_bounded_pair_join(spark, reg):
    plan = plan_of(spark, reg, "q236_kendall_tau")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the bounded top-k pair join


# ---------------------------------------------------------------------------
# q237
# ---------------------------------------------------------------------------

_CDF = None


def _pois_cdf():
    global _CDF
    if _CDF is None:
        _CDF = [
            math.floor(
                sum(math.exp(-1) / math.factorial(j) for j in range(k + 1))
                * (1 << 60)
            )
            for k in range(8)
        ]
    return _CDF


def _pois_w(b, key):
    hx = hashlib.md5(f"pb:{key}".encode()).hexdigest()
    h1 = int(hx[:15], 16)
    h2 = int(hx[15:28], 16)
    u = (h1 + b * h2) % (1 << 60)
    for k, t in enumerate(_pois_cdf()):
        if u < t:
            return k
    return 8


def test_q237_matches_python_model(spark, reg):
    cents = {
        r.o_orderkey: int(round(r.o_totalprice * 100)) for r in _orders(spark)
    }
    means = []
    for b in range(64):
        n = s = 0
        for k, c in cents.items():
            w = _pois_w(b, k)
            n += w
            s += w * c
        if n > 0:
            means.append(round(s / n, 6) + 0.0)
    means.sort()
    row = reg["q237_poisson_bootstrap"].fn(spark, SF).collect()[0]
    assert row.n_orders == len(cents)
    assert row.n_replicas == len(means)
    assert row.mean_cents == round(sum(cents.values()) / len(cents), 6) + 0.0
    assert row.boot_lo_cents == means[1]  # nearest-rank 2.5% of 64
    assert row.boot_hi_cents == means[62]
    assert row.boot_lo_cents <= row.mean_cents <= row.boot_hi_cents


# ---------------------------------------------------------------------------
# q238
# ---------------------------------------------------------------------------


def _round_half_up(x: float, nd: int) -> float:
    """Spark's round(double, nd): shortest-decimal-repr then HALF_UP
    (BigDecimal.valueOf semantics) — differs from Python's half-even
    round exactly at decimal midpoints, which real data does hit."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def test_q238_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_tables(spark, SF, ["embeddings"])["embeddings"].collect()
    }
    seeds = {k: emb[k] for k in range(8)}
    sums: dict = {}
    for vid, v in emb.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(v, s)), sid)
            for sid, s in seeds.items()
        )[1]
        for dim, x in enumerate(v):
            key = (best, dim)
            n, s = sums.get(key, (0, 0))
            sums[key] = (n + 1, s + int(_round_half_up(x * 1e6, 0)))
    got = {
        (r.cluster, r.dim): (r.n, r.centroid)
        for r in reg["q238_lloyd_iteration"].fn(spark, SF).collect()
    }
    assert set(got) == set(sums)
    for key, (n, s) in sums.items():
        assert got[key] == (n, _round_half_up(s / (n * 1e6), 6) + 0.0)


def test_q238_counts_partition_vectors(spark, reg):
    rows = reg["q238_lloyd_iteration"].fn(spark, SF).collect()
    n_dims = max(r.dim for r in rows) + 1
    per_cluster = {r.cluster: r.n for r in rows if r.dim == 0}
    from postgresimporter_spark.sources.parquet import load_tables

    total = load_tables(spark, SF, ["embeddings"])["embeddings"].count()
    assert sum(per_cluster.values()) == total  # every vector assigned once
    assert len(rows) == len(per_cluster) * n_dims


# ---------------------------------------------------------------------------
# q239
# ---------------------------------------------------------------------------


def test_q239_matches_python_model(spark, reg):
    from collections import Counter

    rows = _orders(spark)
    N = len(rows)
    POS = sum(r.o_orderstatus == "F" for r in rows)

    def h(pos, n):
        if pos <= 0 or pos >= n:
            return 0.0
        p, q = pos / n, (n - pos) / n
        return -(p * math.log(p) + q * math.log(q))

    h_pico = int(round(h(POS, N) * 1e12))
    for feature, fv in (
        ("priority", lambda r: r.o_orderpriority),
        ("order_year", lambda r: str(r.o_orderdate.year)),
    ):
        cnt, pos = Counter(), Counter()
        for r in rows:
            v = fv(r)
            cnt[v] += 1
            pos[v] += r.o_orderstatus == "F"
        cond = sum(
            int(round((cnt[v] / N) * h(pos[v], cnt[v]) * 1e12)) for v in cnt
        )
        row = next(
            r
            for r in reg["q239_info_gain"].fn(spark, SF).collect()
            if r.feature == feature
        )
        assert row.n_values == len(cnt)
        assert row.h_label == round(h_pico / 1e12, 6) + 0.0
        assert row.h_cond == round(cond / 1e12, 6) + 0.0
        assert row.gain == round((h_pico - cond) / 1e12, 6) + 0.0
        assert row.gain >= -1e-9  # information gain is non-negative


def test_q237_q239_plan_shapes(spark, reg):
    for name, max_scans in (
        ("q237_poisson_bootstrap", 2),
        ("q239_info_gain", 2),
        ("q238_lloyd_iteration", 2),
    ):
        plan = plan_of(spark, reg, name)
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        assert plan.count("Scan parquet") <= max_scans
