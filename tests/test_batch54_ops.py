"""Batch-54: re-id risk / Laplace mechanism / yield curve / target
encoding vs independent Python models at sf0.001."""

from __future__ import annotations

import hashlib
import math

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_q264_matches_python_model(spark, reg):
    from collections import Counter

    from postgresimporter_spark.sources.parquet import load_tables

    cust = load_tables(spark, SF, ["customer"])["customer"].collect()
    classes = Counter((r.c_nationkey, r.c_mktsegment) for r in cust)
    N = len(cust)
    singles = sum(v for v in classes.values() if v == 1)
    below = sum(v for v in classes.values() if v < 5)
    row = reg["q264_reid_risk"].fn(spark, SF).collect()[0]
    assert (row.n_records, row.n_classes) == (N, len(classes))
    assert row.prosecutor_risk == round(singles / N, 6) + 0.0
    assert row.below_k_share == round(below / N, 6) + 0.0
    assert row.journalist_risk == round(1 / min(classes.values()), 6) + 0.0
    assert row.prosecutor_risk <= row.below_k_share


def test_q265_matches_python_model(spark, reg):
    from collections import Counter

    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"].collect()
    counts = Counter(r.event_type for r in ev)
    got = {r.event_type: r for r in reg["q265_dp_noisy_counts"].fn(spark, SF).collect()}
    assert set(got) == set(counts)
    for et, n in counts.items():
        h = int(hashlib.md5(f"dp:{et}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        noise = -(1 / 0.5) * math.copysign(1, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )
        r = got[et]
        assert r.true_count == n
        assert r.noise == round(noise, 4) + 0.0
        assert r.noisy_count == round(n + noise, 4) + 0.0
        assert r.abs_err == round(abs(noise), 4) + 0.0
    # Laplace(b=2): |noise| rarely exceeds ~20 = 10b
    assert all(abs(r.noise) < 20 for r in got.values())


def test_q266_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"].collect()
    stats = [(len(r.text), len(r.text.strip().split())) for r in docs]
    N = len(stats)
    got = {
        (r.min_chars, r.min_tokens): (r.n_docs, r.n_pass, r.__getattr__("yield"))
        for r in reg["q266_quality_yield_curve"].fn(spark, SF).collect()
    }
    assert len(got) == 20
    for c in (50, 100, 200, 300, 400):
        for t in (5, 10, 20, 40):
            n_pass = sum(ch >= c and tk >= t for ch, tk in stats)
            assert got[(c, t)] == (N, n_pass, round(n_pass / N, 6) + 0.0)
    # yields are monotone non-increasing along each axis
    chars = (50, 100, 200, 300, 400)
    for lo, hi in zip(chars, chars[1:]):
        for t in (5, 10, 20, 40):
            assert got[(lo, t)][1] >= got[(hi, t)][1]


def test_q267_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    parts = load_tables(spark, SF, ["part"])["part"].collect()
    by_brand = defaultdict(list)
    for r in parts:
        by_brand[r.p_brand].append(int(round(r.p_retailprice * 100)))
    sums = {b: (len(v), sum(v)) for b, v in by_brand.items()}
    got = {r.p_partkey: r for r in reg["q267_target_encoding"].fn(spark, SF).collect()}
    assert len(got) == len(parts)
    for r in parts:
        c = int(round(r.p_retailprice * 100))
        n_b, s_b = sums[r.p_brand]
        out = got[r.p_partkey]
        assert out.price_cents == c
        if n_b > 1:
            assert out.brand_loo_mean_cents == round((s_b - c) / (n_b - 1), 4) + 0.0
        else:
            assert out.brand_loo_mean_cents is None
