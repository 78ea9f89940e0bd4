"""Batch-61: frequent sequences, SAX motifs, coverage selection vs
independent Python models at sf0.001."""

from __future__ import annotations

from fractions import Fraction

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _events(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"]
    return [
        (r.user_id, r.ts, r.event_id, r.event_type, r.value)
        for r in ev.collect()
    ]


def test_q292_matches_python_model(spark, reg):
    rows = _events(spark)
    want = {}
    by_user = {}
    for u, ts, eid, et, _v in rows:
        by_user.setdefault(u, []).append(((ts, eid), et))
    for u, evs in by_user.items():
        evs.sort()
        types = {et for _, et in evs}
        for a in types:
            ka = min(k for k, et in evs if et == a)
            for b in types:
                kb = max(k for k, et in evs if et == b)
                if ka < kb:
                    want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (r.type_a, r.type_b): r.n_users
        for r in reg["q292_frequent_sequences"].fn(spark, SF).collect()
    }
    assert got == want


def test_q293_matches_python_model(spark, reg):
    rows = _events(spark)
    by_user = {}
    for u, ts, eid, _et, v in rows:
        by_user.setdefault(u, []).append(((ts, eid), round(v * 100)))
    words = {}
    for u, evs in by_user.items():
        evs.sort()
        n = len(evs)
        segs = {}
        for i, (_k, cents) in enumerate(evs):
            s = (i * 8) // n
            tot, cnt = segs.get(s, (0, 0))
            segs[s] = (tot + cents, cnt + 1)
        means = {s: Fraction(t, c) for s, (t, c) in segs.items()}
        word = ""
        for s in sorted(means):
            r = 1 + sum(
                1
                for s2 in means
                if means[s2] < means[s]
                or (means[s2] == means[s] and s2 < s)
            )
            q = -(-4 * r // 8)  # ceil(4r/8)
            word_sym = chr(96 + q)
            word += word_sym
        words[u] = word
    want = {}
    for w in words.values():
        want[w] = want.get(w, 0) + 1
    got = {
        r.sax_word: r.n_users
        for r in reg["q293_sax_motifs"].fn(spark, SF).collect()
    }
    assert got == want


def test_q294_matches_python_greedy(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"]
    sh = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split()
        sh[r.doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
        }
    covered: set = set()
    want = []
    for step in (1, 2, 3):
        best = max(
            sh, key=lambda d: (len(sh[d] - covered), -d)
        )
        gain = len(sh[best] - covered)
        want.append((step, best, gain))
        covered |= sh[best]
    got = [
        (r.step, r.doc_id, r.gain)
        for r in reg["q294_coverage_select"].fn(spark, SF).collect()
    ]
    assert sorted(got) == want
    # greedy gains are non-increasing (submodularity)
    gains = [g for _, _, g in sorted(got)]
    assert gains == sorted(gains, reverse=True)
