"""Batch-55: k-fold / learning curve / kappa / datasheet vs
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


def _docs(spark):
    from postgresimporter_spark.sources.parquet import load_tables

    return load_tables(spark, SF, ["documents"])["documents"].collect()


def _h(prefix, key):
    return int(hashlib.md5(f"{prefix}:{key}".encode()).hexdigest()[:15], 16)


def test_q268_matches_python_model(spark, reg):
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        f = _h("kf", r.doc_id) % 5
        per[f][0] += 1
        per[f][1] += r.n_chars
    N = sum(v[0] for v in per.values())
    S = sum(v[1] for v in per.values())
    got = {r.fold: r for r in reg["q268_kfold_metrics"].fn(spark, SF).collect()}
    assert set(got) == set(per)
    for f, (n, s) in per.items():
        assert got[f].n_docs == n
        assert got[f].mean_chars == round(s / n, 4) + 0.0
        assert got[f].dev_from_global == round(s / n - S / N, 4) + 0.0


def test_q269_matches_python_model_and_nesting(spark, reg):
    from collections import Counter

    rows = [(_h("lc", r.doc_id) % 100, r.text.strip().split()) for r in _docs(spark)]
    got = {r.fraction_pct: r for r in reg["q269_learning_curve"].fn(spark, SF).collect()}
    prev_vocab = prev_tokens = 0
    for f in (10, 25, 50, 75, 100):
        sample = [toks for b, toks in rows if b < f]
        freq = Counter(t for toks in sample for t in toks)
        n_tok = sum(freq.values())
        r = got[f]
        assert (r.n_docs, r.n_tokens, r.vocab) == (
            len(sample), n_tok, len(freq),
        )
        assert r.type_token_ratio == round(len(freq) / n_tok, 6) + 0.0
        # nesting: monotone growth
        assert r.vocab >= prev_vocab and r.n_tokens >= prev_tokens
        prev_vocab, prev_tokens = r.vocab, r.n_tokens
    assert got[100].n_docs == len(rows)


def test_q270_matches_python_model(spark, reg):
    n = both = a_only = b_only = neither = 0
    for r in _docs(spark):
        a = len(r.text) >= 200
        b = len(r.text.strip().split()) >= 20
        n += 1
        both += a and b
        a_only += a and not b
        b_only += b and not a
        neither += not a and not b
    po = (both + neither) / n
    pa, pb = (both + a_only) / n, (both + b_only) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    row = reg["q270_cohens_kappa"].fn(spark, SF).collect()[0]
    assert (row.n, row.n_both, row.a_only, row.b_only, row.neither) == (
        n, both, a_only, b_only, neither,
    )
    assert row.observed_agreement == round(po, 6) + 0.0
    assert row.kappa == round((po - pe) / (1 - pe), 6) + 0.0
    assert -1 - 1e-9 <= row.kappa <= 1 + 1e-9


def test_q271_matches_python_model(spark, reg):
    from collections import Counter

    docs = _docs(spark)
    n_docs = len(docs)
    toks = [r.text.strip().split() for r in docs]
    n_tokens = sum(len(t) for t in toks)
    vocab = len({t for ts in toks for t in ts})
    text_counts = Counter(r.text for r in docs)
    dup_docs = sum(c - 1 for c in text_counts.values())
    src = Counter(r.source for r in docs)
    ent = sum(
        int(round(-(c / n_docs) * math.log(c / n_docs) * 1e12))
        for c in src.values()
    )
    n_chars = sum(len(r.text) for r in docs)
    row = reg["q271_corpus_datasheet"].fn(spark, SF).collect()[0]
    assert (row.n_docs, row.n_tokens, row.vocab) == (n_docs, n_tokens, vocab)
    assert row.exact_dup_rate == round(dup_docs / n_docs, 6) + 0.0
    assert row.source_entropy_nats == round(ent / 1e12, 6) + 0.0
    assert row.mean_chars == round(n_chars / n_docs, 4) + 0.0
    assert row.mean_tokens == round(n_tokens / n_docs, 4) + 0.0
