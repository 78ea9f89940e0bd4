"""Batch-51: CvM / HHI / diversity / edit distance vs independent
Python models at sf0.001, plus plan pins."""

from __future__ import annotations

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
# q252
# ---------------------------------------------------------------------------


def test_q252_matches_python_model(spark, reg):
    from collections import Counter

    a, b = Counter(), Counter()
    for r in _orders(spark):
        y = r.o_orderdate.year
        if y in (1995, 1996):
            v = int(r.o_totalprice * 100)
            (a if y == 1995 else b)[v] += 1
    n, m = sum(a.values()), sum(b.values())
    ca = cb = 0
    t_num = 0
    for v in sorted(set(a) | set(b)):
        ca += a[v]
        cb += b[v]
        gap = m * ca - n * cb
        t_num += (a[v] + b[v]) * gap * gap
    t_micro = round(t_num / (n * m * (n + m) ** 3) * 1e6, 4) + 0.0
    row = reg["q252_cramer_von_mises"].fn(spark, SF).collect()[0]
    assert (row.na, row.nb) == (n, m)
    assert row.t_micro == t_micro
    assert row.t_micro >= 0


def test_q252_no_unpartitioned_window(spark, reg):
    from test_plans import unpartitioned_windows

    plan = physical_plan(reg["q252_cramer_von_mises"].fn(spark, SF))
    assert not unpartitioned_windows(plan)


# ---------------------------------------------------------------------------
# q253
# ---------------------------------------------------------------------------


def test_q253_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    t = load_tables(spark, SF, ["orders", "customer", "nation"])
    nation = {
        r.c_custkey: r.c_nationkey for r in t["customer"].collect()
    }
    nname = {r.n_nationkey: r.n_name for r in t["nation"].collect()}
    per = defaultdict(lambda: defaultdict(int))
    for r in t["orders"].collect():
        per[nname[nation[r.o_custkey]]][r.o_custkey] += int(
            round(r.o_totalprice * 100)
        )
    got = {r.nation: r for r in reg["q253_hhi_concentration"].fn(spark, SF).collect()}
    assert set(got) == set(per)
    for nat, custs in per.items():
        T = sum(custs.values())
        sq = sum(c * c for c in custs.values())
        hhi = sq / (T * T)
        r = got[nat]
        assert (r.n_customers, r.total_cents) == (len(custs), T)
        assert r.hhi == round(hhi, 6) + 0.0
        assert r.effective_customers == round(1 / hhi, 4) + 0.0
        assert 1 / len(custs) - 1e-9 <= r.hhi <= 1 + 1e-9


def test_q253_dims_broadcast(spark, reg):
    plan = physical_plan(reg["q253_hhi_concentration"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation dims
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# q254
# ---------------------------------------------------------------------------


def test_q254_matches_python_model(spark, reg):
    from collections import Counter, defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"].collect()
    per = defaultdict(Counter)
    for r in docs:
        per[r.source].update(r.text.strip().split())
    got = {r.source: r for r in reg["q254_diversity_indexes"].fn(spark, SF).collect()}
    assert set(got) == set(per)
    for src, cnt in per.items():
        N = sum(cnt.values())
        h = sum(
            int(round(-(v / N) * math.log(v / N) * 1e12)) for v in cnt.values()
        )
        simpson = 1 - sum(v * (v - 1) for v in cnt.values()) / (N * (N - 1))
        r = got[src]
        assert (r.n_tokens, r.richness) == (N, len(cnt))
        assert r.shannon_nats == round(h / 1e12, 6) + 0.0
        assert r.simpson == round(simpson, 6) + 0.0
        assert r.evenness == round((h / 1e12) / math.log(len(cnt)), 6) + 0.0
        assert 0 <= r.evenness <= 1 + 1e-9


# ---------------------------------------------------------------------------
# q255
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_q255_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"].collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type[0]))
    seqs = {
        u: "".join(c for _, _, c in sorted(v)[:30]) for u, v in per.items()
    }
    top = sorted(per, key=lambda u: (-len(per[u]), u))[:20]
    want = {}
    for i, ua in enumerate(top):
        for ub in top[i + 1 :]:
            x, y = sorted((ua, ub))
            d = _lev(seqs[x], seqs[y])
            want[(x, y)] = (
                d,
                round(d / max(len(seqs[x]), len(seqs[y])), 6) + 0.0,
            )
    got = {
        (r.user_a, r.user_b): (r.edit_distance, r.normalized)
        for r in reg["q255_sequence_edit_distance"].fn(spark, SF).collect()
    }
    assert got == want
    assert len(got) == len(top) * (len(top) - 1) // 2
