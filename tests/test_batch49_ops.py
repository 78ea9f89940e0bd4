"""Batch-49: Flesch / truncated recall / RFM / assortativity vs
independent Python models at sf0.001, plus plan pins."""

from __future__ import annotations

import math
import re

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


# ---------------------------------------------------------------------------
# q244
# ---------------------------------------------------------------------------


def test_q244_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"].collect()
    got = {r.doc_id: r for r in reg["q244_flesch"].fn(spark, SF).collect()}
    n_checked = 0
    for d in docs:
        w = len(re.findall(r"[^\s]+", d.text))
        if w == 0:
            assert d.doc_id not in got
            continue
        s = max(len(re.findall(r"[.!?]+", d.text)), 1)
        y = len(re.findall(r"[aeiouy]+", d.text.lower()))
        r = got[d.doc_id]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y)
        assert r.flesch == round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4) + 0.0
        n_checked += 1
    assert n_checked == len(got)


def test_q244_single_scan(spark, reg):
    plan = physical_plan(reg["q244_flesch"].fn(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# q245
# ---------------------------------------------------------------------------


def _emb_rows(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    return [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in load_tables(spark, SF, ["embeddings"])["embeddings"].collect()
    ]


def test_q245_matches_python_model(spark, reg):
    rows = _emb_rows(spark)
    probes = [(vid, v) for vid, v in rows if vid < 20]
    corpus = [(vid, v) for vid, v in rows if vid >= 20]

    def sim(v, p):
        dot = sum(a * b for a, b in zip(v, p))
        return int(
            round(
                dot
                / math.sqrt(
                    sum(a * a for a in v) * sum(b * b for b in p)
                )
                * 1e6
            )
        )

    want = {}
    for pid, p in probes:
        full = sorted(
            ((-sim(v, p), vid) for vid, v in corpus)
        )[:10]
        trunc = sorted(
            ((-sim(v[:8], p[:8]), vid) for vid, v in corpus)
        )[:10]
        hits = len({vid for _, vid in full} & {vid for _, vid in trunc})
        want[pid] = (hits, round(hits / 10, 6) + 0.0)
    got = {
        r.probe_id: (r.n_hits, r.recall_at_10)
        for r in reg["q245_truncated_recall"].fn(spark, SF).collect()
    }
    assert got == want


def test_q245_partitioned_windows_only(spark, reg):
    from test_plans import unpartitioned_windows

    plan = physical_plan(reg["q245_truncated_recall"].fn(spark, SF))
    assert not unpartitioned_windows(plan)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # one per ranking


# ---------------------------------------------------------------------------
# q246
# ---------------------------------------------------------------------------


def test_q246_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    orders = load_tables(spark, SF, ["orders"])["orders"].collect()
    per: dict = {}
    for r in orders:
        d = r.o_orderdate.date()
        c = int(round(r.o_totalprice * 100))
        if r.o_custkey not in per:
            per[r.o_custkey] = [d, 0, 0]
        p = per[r.o_custkey]
        p[0] = max(p[0], d)
        p[1] += 1
        p[2] += c
    end = max(p[0] for p in per.values())
    N = len(per)

    def quint(order):
        out = {}
        for i, k in enumerate(order, start=1):
            out[k] = math.ceil(5 * i / N)
        return out

    rq = quint(sorted(per, key=lambda k: ((end - per[k][0]).days, k)))
    fq = quint(sorted(per, key=lambda k: (-per[k][1], k)))
    mq = quint(sorted(per, key=lambda k: (-per[k][2], k)))
    want: dict = {}
    for k, p in per.items():
        seg = (rq[k], fq[k], mq[k])
        n, cents = want.get(seg, (0, 0))
        want[seg] = (n + 1, cents + p[2])
    got = {
        (r.r_q, r.f_q, r.m_q): (r.n_customers, r.segment_cents)
        for r in reg["q246_rfm_segments"].fn(spark, SF).collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) == N
    assert all(1 <= q <= 5 for seg in got for q in seg)


def test_q246_no_unpartitioned_window(spark, reg):
    from test_plans import unpartitioned_windows

    plan = physical_plan(reg["q246_rfm_segments"].fn(spark, SF))
    assert not unpartitioned_windows(plan)


# ---------------------------------------------------------------------------
# q247
# ---------------------------------------------------------------------------


def test_q247_matches_python_model(spark, reg):
    from collections import Counter

    from postgresimporter_spark.plans.catalog_batch18 import _edges

    edges = [(r.src, r.dst) for r in _edges(spark, SF).collect()]
    deg = Counter()
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    pts = []
    for s, d in edges:
        pts.append((deg[s], deg[d]))
        pts.append((deg[d], deg[s]))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    cov = n * sxy - sx * sy
    r = cov / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    row = reg["q247_assortativity"].fn(spark, SF).collect()[0]
    assert row.n_directed_edges == n
    assert row.assortativity == round(r, 6) + 0.0
    assert -1 - 1e-9 <= row.assortativity <= 1 + 1e-9
