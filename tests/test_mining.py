"""Mining operators: known-answer micro-fixtures independent of the
DuckDB differential gate (which exercises them corpus-wide as q120-q124)."""

from __future__ import annotations

import math

from postgresimporter_spark.operators.mining import (
    bigram_perplexity,
    cdc_chunks,
    containment_pairs,
    hard_negatives,
    pmi_bigrams,
    unigram_logprob,
)


def test_containment_catches_subset_dup(spark):
    # doc 2 is a strict subset of doc 1: Jaccard is diluted (6/12 shingles)
    # but containment is 1.0. doc 3 shares nothing.
    long = "a b c d e f g h i j k l m n"  # 12 3-gram shingles
    sub = "a b c d e f g h"  # 6 shingles, all inside long
    df = spark.createDataFrame(
        [(1, long), (2, sub), (3, "x y z w v u t s")], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, threshold=0.9, n=3).collect()
    }
    assert got == {(1, 2): 1.0}


def test_unigram_logprob_known_values(spark):
    # corpus: "a a a b" -> P(a)=3/4, P(b)=1/4
    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_tokens, r.avg_logprob) for r in unigram_logprob(df).collect()}
    lp_a, lp_b = math.log(3 / 4), math.log(1 / 4)
    assert got[1][0] == 2 and abs(got[1][1] - lp_a) < 1e-6
    assert got[2][0] == 2 and abs(got[2][1] - (lp_a + lp_b) / 2) < 1e-6


def test_bigram_perplexity_known_values(spark):
    # corpus "a b a b" + "a b": V=2, c(a)=3, c(b)=3, c(a,b)=3, c(b,a)=1
    # doc 2's only bigram: P(b|a) = (3+1)/(3+1*2) = 4/5
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], ["doc_id", "text"])
    got = {r.doc_id: r for r in bigram_perplexity(df, k=1).collect()}
    assert got[2].n_bigrams == 1
    assert abs(got[2].avg_nll - (-math.log(4 / 5))) < 1e-6
    assert abs(got[2].ppl - 5 / 4) < 1e-3
    # doc with a single token has no bigram evidence -> excluded
    df1 = spark.createDataFrame([(1, "a b"), (2, "x")], ["doc_id", "text"])
    assert {r.doc_id for r in bigram_perplexity(df1).collect()} == {1}


def test_pmi_prefers_exclusive_pair(spark):
    # "x y" always adjacent and exclusive -> max PMI; "a b" also occurs
    # but a and b are individually frequent elsewhere -> lower PMI.
    rows = [(i, "x y") for i in range(5)] + [
        (10, "a b"), (11, "a b"), (12, "a b"), (13, "a b"), (14, "a b"),
        (20, "a c a c a"), (21, "b d b d b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.w1, r.w2): r.pmi for r in pmi_bigrams(df, min_count=5).collect()}
    assert ("x", "y") in got and ("a", "b") in got
    assert got[("x", "y")] > got[("a", "b")]


def test_hard_negatives_excludes_same_label(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.99, 0.1], 0),   # most similar, but same label
            (3, [0.9, 0.2], 1),    # best different-label
            (4, [0.0, 1.0], 1),
        ],
        ["vec_id", "embedding", "label"],
    )
    probes = spark.createDataFrame(
        [(100, [1.0, 0.0], 0)], ["probe_id", "embedding", "label"]
    )
    got = [
        (r.vec_id, r.rank)
        for r in hard_negatives(corpus, probes, k=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(3, 1), (4, 2)]


def test_cdc_chunks_content_anchored(spark):
    # identical tail after an insertion: the chunks AFTER the first
    # boundary following the edit must hash identically in both docs —
    # the property fixed-size chunking lacks.
    base = "p q r s t u v w x y z m n o"
    edited = "EDIT " + base
    df = spark.createDataFrame([(1, base), (2, edited)], ["doc_id", "text"])
    out = cdc_chunks(df, mask_bits=1)  # dense boundaries on tiny vocab
    h1 = {r.chunk_hash for r in out.where("doc_id = 1").collect()}
    h2 = {r.chunk_hash for r in out.where("doc_id = 2").collect()}
    shared = h1 & h2
    # every chunk of doc 1 from the first content boundary on reappears
    # in doc 2 (the edit only perturbs the prefix chunk)
    assert len(shared) >= len(h1) - 1
    # chunk token counts per doc reassemble the full doc
    n1 = sum(r.n_tokens for r in out.where("doc_id = 1").collect())
    assert n1 == len(base.split())


def test_cdc_chunks_sliced_identity(spark):
    """r12 giant-doc straggler fix: the two-phase sliced prefix sum
    (within-slice running sum + per-slice carry-in) produces the EXACT
    rows of the single-window path — exercised with slice sizes down
    to 2 so carries cross many boundaries, plus empty and
    single-token docs."""
    docs = [
        (1, " ".join(f"t{(i * 7) % 23}" for i in range(157))),
        (2, " ".join(f"u{(i * 5) % 11}" for i in range(64))),
        (3, "solo"),
        (4, "   "),  # blank: zero tokens, zero chunks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for mb in (1, 4):
        base = {
            tuple(r)
            for r in cdc_chunks(df, mask_bits=mb, chunk=None).collect()
        }
        for c in (2, 7, 1 << 16):
            got = {
                tuple(r)
                for r in cdc_chunks(df, mask_bits=mb, chunk=c).collect()
            }
            assert got == base, f"mask_bits={mb} chunk={c}"
