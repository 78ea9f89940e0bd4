"""Batch-48: clustering agreement / AP / Kaplan-Meier / recursive BFS
vs independent Python models at sf0.001, plus plan pins."""

from __future__ import annotations

import math

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _embeddings(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    return [
        (r.vec_id, r.label, [float(x) for x in r.embedding])
        for r in load_tables(spark, SF, ["embeddings"])["embeddings"].collect()
    ]


def _assign(rows):
    seeds = {vid: v for vid, _, v in rows if vid < 8}
    out = {}
    for vid, label, v in rows:
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(v, s)), sid)
            for sid, s in seeds.items()
        )[1]
        out[vid] = (best, label)
    return out


# ---------------------------------------------------------------------------
# q240
# ---------------------------------------------------------------------------


def test_q240_matches_python_model(spark, reg):
    from collections import Counter

    assign = _assign(_embeddings(spark))
    cells = Counter(assign.values())
    n_c = Counter(c for c, _ in assign.values())
    n_j = Counter(l for _, l in assign.values())
    N = len(assign)
    purity_num = sum(
        max(v for (c2, _), v in cells.items() if c2 == c) for c in n_c
    )
    mi = sum(
        int(round((v / N) * math.log(N * v / (n_c[c] * n_j[l])) * 1e12))
        for (c, l), v in cells.items()
    )
    hc = sum(
        int(round(-(v / N) * math.log(v / N) * 1e12)) for v in n_c.values()
    )
    hl = sum(
        int(round(-(v / N) * math.log(v / N) * 1e12)) for v in n_j.values()
    )
    C2 = lambda x: x * (x - 1) // 2  # noqa: E731
    idx = sum(C2(v) for v in cells.values())
    pc, pl = sum(C2(v) for v in n_c.values()), sum(C2(v) for v in n_j.values())
    exp_idx = pc * pl / C2(N)
    max_idx = (pc + pl) / 2
    row = reg["q240_clustering_agreement"].fn(spark, SF).collect()[0]
    assert row.n == N
    assert row.purity == round(purity_num / N, 6) + 0.0
    assert row.nmi == round(mi / math.sqrt(hc * hl), 6) + 0.0
    assert row.ari == round((idx - exp_idx) / (max_idx - exp_idx), 6) + 0.0
    assert 0 <= row.purity <= 1 and row.ari <= 1.000001


# ---------------------------------------------------------------------------
# q241
# ---------------------------------------------------------------------------


def test_q241_matches_python_model(spark, reg):
    rows = _embeddings(spark)
    probe = next((l, v) for vid, l, v in rows if vid == 0)
    scored = []
    for vid, label, v in rows:
        if vid == 0:
            continue
        dot = sum(a * b for a, b in zip(v, probe[1]))
        na = sum(a * a for a in v)
        nb = sum(b * b for b in probe[1])
        sim = int(round(dot / math.sqrt(na * nb) * 1e6))
        scored.append((-sim, vid, int(label == probe[0])))
    scored.sort()
    n_rel = sum(r for _, _, r in scored)
    cum = ap = rel10 = 0
    for i, (_, _, r) in enumerate(scored, start=1):
        cum += r
        if r:
            ap += int(round(cum / i * 1e12))
        if i <= 10:
            rel10 += r
    row = reg["q241_average_precision"].fn(spark, SF).collect()[0]
    assert (row.n_corpus, row.n_relevant) == (len(scored), n_rel)
    assert row.average_precision == round(ap / (n_rel * 1e12), 6) + 0.0
    assert row.p_at_10 == round(rel10 / 10, 6) + 0.0
    assert 0 <= row.average_precision <= 1


def test_q241_q242_no_unpartitioned_window(spark, reg):
    from test_plans import unpartitioned_windows

    for name in ("q241_average_precision", "q242_kaplan_meier"):
        plan = physical_plan(reg[name].fn(spark, SF))
        assert not unpartitioned_windows(plan)
        assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q242
# ---------------------------------------------------------------------------


def test_q242_matches_python_model(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"].collect()
    first: dict = {}
    last: dict = {}
    for r in ev:
        u = r.user_id
        first[u] = min(first.get(u, r.ts), r.ts)
        last[u] = max(last.get(u, r.ts), r.ts)
    import datetime

    end = max(last.values())
    per_t = defaultdict(lambda: [0, 0])
    for u in first:
        t = (last[u].date() - first[u].date()).days
        died = last[u] < end - datetime.timedelta(days=7)
        per_t[t][0 if died else 1] += 1
    N = len(first)
    left = 0
    ln_cum = 0
    want = []
    for t in sorted(per_t):
        d, c = per_t[t]
        at_risk = N - left
        left += d + c
        if d > 0:
            ln_cum += int(round(math.log(1 - d / at_risk) * 1e12))
        want.append((t, at_risk, d, c, round(math.exp(ln_cum / 1e12), 6) + 0.0))
    got = [
        (r.t, r.at_risk, r.deaths, r.censored, r.survival)
        for r in reg["q242_kaplan_meier"].fn(spark, SF).collect()
    ]
    assert got == want
    surv = [s for *_, s in got]
    assert surv == sorted(surv, reverse=True)  # monotone non-increasing


# ---------------------------------------------------------------------------
# q243
# ---------------------------------------------------------------------------


def test_q243_matches_python_bfs(spark, reg):
    from collections import defaultdict, deque

    from postgresimporter_spark.plans.catalog_batch18 import _edges

    edges = [(r.src, r.dst) for r in _edges(spark, SF).collect()]
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    seed = min(s for s, _ in edges)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {r.node: r.hops for r in reg["q243_recursive_bfs"].fn(spark, SF).collect()}
    assert got == dist
