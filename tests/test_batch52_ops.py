"""Batch-52: conformance / stratified split / negative sampling /
Markov accuracy vs independent Python models at sf0.001."""

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


def _transitions(spark):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"].collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    out = []
    for seq in per.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# q256
# ---------------------------------------------------------------------------


def test_q256_matches_python_model(spark, reg):
    from collections import Counter

    allowed = {
        ("view", "view"), ("view", "click"), ("click", "click"),
        ("click", "purchase"), ("purchase", "view"), ("login", "view"),
        ("view", "logout"),
    }
    trans = _transitions(spark)
    bad = Counter(t for t in trans if t not in allowed)
    got = {
        (r.prev, r.next): (r.n_violations, r.n_total, r.violation_share)
        for r in reg["q256_conformance"].fn(spark, SF).collect()
    }
    assert set(got) == set(bad)
    for t, n in bad.items():
        assert got[t] == (n, len(trans), round(n / len(trans), 6) + 0.0)


# ---------------------------------------------------------------------------
# q257
# ---------------------------------------------------------------------------


def test_q257_matches_python_model_and_proportions(spark, reg):
    from collections import defaultdict

    from postgresimporter_spark.sources.parquet import load_tables

    emb = load_tables(spark, SF, ["embeddings"])["embeddings"].collect()
    strata = defaultdict(list)
    for r in emb:
        h = int(
            hashlib.md5(f"split:{r.vec_id}".encode()).hexdigest()[:15], 16
        )
        strata[r.label].append((h, r.vec_id))
    want: dict = {}
    for label, rows in strata.items():
        rows.sort()
        n = len(rows)
        t_cut, v_cut = math.ceil(0.8 * n), math.ceil(0.9 * n)
        for i in range(n):
            split = "train" if i < t_cut else ("val" if i < v_cut else "test")
            want[(label, split)] = want.get((label, split), 0) + 1
    got = {
        (r.label, r.split): r.n
        for r in reg["q257_stratified_split"].fn(spark, SF).collect()
    }
    assert got == want
    # per-label totals conserved; train share within one unit of 80%
    for label, rows in strata.items():
        n = len(rows)
        assert sum(v for (l2, _), v in got.items() if l2 == label) == n
        assert got.get((label, "train"), 0) == math.ceil(0.8 * n)


def test_q257_reproducible(spark, reg):
    a = sorted(
        map(tuple, reg["q257_stratified_split"].fn(spark, SF).collect())
    )
    b = sorted(
        map(tuple, reg["q257_stratified_split"].fn(spark, SF).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# q258
# ---------------------------------------------------------------------------


def test_q258_matches_python_model(spark, reg):
    from collections import Counter

    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"].collect()
    freq = Counter()
    for r in docs:
        freq.update(r.text.strip().split())
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    weights = [
        (t, f, int(math.floor(f**0.75 * 1e6))) for t, f in top
    ]
    total = sum(w for _, _, w in weights)
    cum = 0
    want = []
    for t, f, w in weights:
        cum += w
        want.append((t, f, w, cum, round(w / total, 6) + 0.0))
    got = [
        (r.token, r.freq, r.weight_micro, r.cumulative_micro, r.probability)
        for r in reg["q258_negative_sampling"].fn(spark, SF).collect()
    ]
    assert got == want
    assert got[-1][3] == total  # cumulative reaches the exact total


def test_q258_no_unpartitioned_window(spark, reg):
    from test_plans import unpartitioned_windows

    plan = physical_plan(reg["q258_negative_sampling"].fn(spark, SF))
    assert not unpartitioned_windows(plan)
    assert "TakeOrderedAndProject" in plan  # distributed top-k


# ---------------------------------------------------------------------------
# q259
# ---------------------------------------------------------------------------


def test_q259_matches_python_model(spark, reg):
    from collections import Counter, defaultdict

    trans = _transitions(spark)
    counts = Counter(trans)
    by_prev = defaultdict(dict)
    for (a, b), n in counts.items():
        by_prev[a][b] = n
    want = {}
    for prev, nxt in by_prev.items():
        pred = min(nxt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        n_tr = sum(nxt.values())
        hits = nxt.get(pred, 0)
        want[prev] = (pred, n_tr, hits, round(hits / n_tr, 6) + 0.0)
    got = {
        r.prev: (r.predicted, r.n_transitions, r.n_hits, r.top1_accuracy)
        for r in reg["q259_markov_accuracy"].fn(spark, SF).collect()
    }
    assert got == want
    for pred, n_tr, hits, acc in got.values():
        assert 0 < acc <= 1  # argmax always hits at least once
