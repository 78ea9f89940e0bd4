"""Batch-57: bootstrap diff / trimmed mean / Spearman / lift vs
independent Python models at sf0.001."""

from __future__ import annotations

import hashlib
import math

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _orders(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    return load_tables(spark, SF, ["orders"])["orders"].collect()


def _pois_cdf():
    return [
        math.floor(
            sum(math.exp(-1) / math.factorial(j) for j in range(k + 1))
            * (1 << 60)
        )
        for k in range(8)
    ]


def test_q276_matches_python_model(spark, reg):
    cdf = _pois_cdf()

    def w_of(b, key):
        hx = hashlib.md5(f"pb:{key}".encode()).hexdigest()
        u = (int(hx[:15], 16) + b * int(hx[15:28], 16)) % (1 << 60)
        for k, t in enumerate(cdf):
            if u < t:
                return k
        return 8

    samples = {1995: {}, 1996: {}}
    for r in _orders(spark):
        y = r.o_orderdate.year
        if y in samples:
            samples[y][r.o_orderkey] = int(round(r.o_totalprice * 100))
    diffs = []
    for b in range(64):
        means = {}
        for y, rows in samples.items():
            n = s = 0
            for k, c in rows.items():
                w = w_of(b, k)
                n += w
                s += w * c
            if n > 0:
                means[y] = round(s / n, 6) + 0.0
        if 1995 in means and 1996 in means:
            diffs.append(round(means[1996] - means[1995], 6) + 0.0)
    diffs.sort()
    row = reg["q276_bootstrap_diff"].fn(spark, SF).collect()[0]
    assert row.n_replicas == len(diffs)
    assert row.diff_lo_cents == diffs[math.ceil(0.025 * 64) - 1]
    assert row.diff_hi_cents == diffs[math.ceil(0.975 * 64) - 1]
    assert row.significant_positive == (row.diff_lo_cents > 0)
    assert row.diff_lo_cents <= row.diff_hi_cents


def test_q277_matches_python_model(spark, reg):
    vals = sorted(
        (int(round(r.o_totalprice * 100)), r.o_orderkey)
        for r in _orders(spark)
    )
    N = len(vals)
    lo = math.ceil(0.05 * N)
    hi = N - lo
    mid = [c for c, _ in vals[lo:hi]]
    lo_cut, hi_cut = mid[0], mid[-1]
    wins = sum(mid) + lo * lo_cut + (N - hi) * hi_cut
    row = reg["q277_trimmed_mean"].fn(spark, SF).collect()[0]
    assert (row.n_all, row.n_mid) == (N, len(mid))
    assert (row.lo_cut, row.hi_cut) == (lo_cut, hi_cut)
    assert row.trimmed_mean_cents == round(sum(mid) / len(mid), 4) + 0.0
    assert row.winsorized_mean_cents == round(wins / N, 4) + 0.0
    # robustness ordering: trimmed/winsorized within the raw min/max
    assert vals[0][0] <= row.trimmed_mean_cents <= vals[-1][0]


def test_q278_matches_python_model(spark, reg):
    from collections import Counter

    from postgresimporter_spark.sources.parquet import load_tables

    parts = load_tables(spark, SF, ["part"])["part"].collect()
    xs = [int(r.p_size) for r in parts]
    ys = [int(round(r.p_retailprice * 100)) for r in parts]

    def ranks2(vals):
        cnt = Counter(vals)
        out = {}
        end = 0
        for v in sorted(cnt):
            end += cnt[v]
            out[v] = 2 * end - cnt[v] + 1
        return out

    rx, ry = ranks2(xs), ranks2(ys)
    pts = [(rx[x], ry[y]) for x, y in zip(xs, ys)]
    n = len(pts)
    sx = sum(a for a, _ in pts)
    sy = sum(b for _, b in pts)
    sxy = sum(a * b for a, b in pts)
    sxx = sum(a * a for a, _ in pts)
    syy = sum(b * b for _, b in pts)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = reg["q278_spearman"].fn(spark, SF).collect()[0]
    assert row.n == n
    assert row.spearman_rho == round(rho, 6) + 0.0
    assert -1 - 1e-9 <= row.spearman_rho <= 1 + 1e-9


def test_q279_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    t = load_tables(spark, SF, ["orders", "lineitem"])
    per_order = defaultdict(lambda: [0, 0])
    for r in t["lineitem"].collect():
        po = per_order[r.l_orderkey]
        po[0] += int(round(r.l_discount * 10000))
        po[1] += 1
    rows = []
    for r in t["orders"].collect():
        if r.o_orderkey not in per_order:
            continue
        s, c = per_order[r.o_orderkey]
        rows.append(
            (-round(s / c, 4), r.o_orderkey, int(r.o_orderstatus == "F"))
        )
    rows.sort()
    N = len(rows)
    per_dec = defaultdict(lambda: [0, 0])
    for i, (_, _, pos) in enumerate(rows, start=1):
        d = math.ceil(10 * i / N)
        per_dec[d][0] += 1
        per_dec[d][1] += pos
    P = sum(v[1] for v in per_dec.values())
    got = {r.decile: r for r in reg["q279_lift_curve"].fn(spark, SF).collect()}
    assert set(got) == set(per_dec)
    cum = 0
    for dec in sorted(per_dec):
        n, npos = per_dec[dec]
        cum += npos
        r = got[dec]
        assert (r.n, r.n_pos) == (n, npos)
        assert r.lift == round((npos / n) / (P / N), 6) + 0.0
        assert r.cum_gain == round(cum / P, 6) + 0.0
    assert abs(got[max(per_dec)].cum_gain - 1.0) < 1e-9
