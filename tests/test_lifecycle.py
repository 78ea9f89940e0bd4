"""Micro-fixture tests for the corpus-lifecycle operators (q129-q132):
incremental MinHash matching, duplicated-span removal, retrieval
ranking metrics, and cross-source overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.operators import curation as C
from postgresimporter_spark.operators import dedup as D
from postgresimporter_spark.operators import similarity as S
from postgresimporter_spark.operators.bucketing import physical_plan


def test_minhash_match_index_flags_history_dups(spark):
    hist = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated tokens about spark shuffles and plans"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # near-dup of doc 0 (one appended token)
            (100, "the quick brown fox jumps over the lazy dog today extra"),
            # novel content: must not match
            (101, "entirely fresh material sharing no trigrams with history"),
        ],
        ["doc_id", "text"],
    )
    index = D.minhash_band_index(hist, num_hashes=16, bands=4)
    out = D.minhash_match_index(index, batch, num_hashes=16, bands=4)
    rows = {(r.new_id, r.hist_id): r.est_jaccard for r in out.collect()}
    assert (100, 0) in rows and rows[(100, 0)] >= 0.5
    assert all(new_id != 101 for new_id, _ in rows)


def test_minhash_match_index_broadcasts_batch(spark):
    hist = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    batch = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    index = D.minhash_band_index(hist)
    out = D.minhash_match_index(index, batch)
    # the new-batch side must broadcast: history (the 100 TB side)
    # never shuffles for the probe join
    assert "BroadcastHashJoin" in physical_plan(out)


def test_minhash_index_matches_selfjoin_pairs(spark):
    """index+match against itself finds the same near-dup pair set as
    the one-shot self-join operator (same hash family, same banding)."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta iota"),
            (2, "nothing in common with anything else at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    index = D.minhash_band_index(docs)
    matched = {
        (min(r.new_id, r.hist_id), max(r.new_id, r.hist_id))
        for r in D.minhash_match_index(index, docs, threshold=0.5)
        .where(F.col("new_id") != F.col("hist_id"))
        .collect()
    }
    assert pairs == matched


def test_remove_duplicate_spans(spark):
    boiler = "one two three four five"  # exactly one 5-gram
    df = spark.createDataFrame(
        [
            (0, boiler + " unique tail zero"),
            (1, boiler + " other ending here"),
            (2, "fully original content with no shared spans anywhere"),
            (3, boiler),  # nothing survives
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in C.remove_duplicate_spans(df, span=5, min_docs=2).collect()
    }
    assert out[0].clean_text == "unique tail zero"
    assert out[0].n_removed == 5 and out[0].n_tokens == 8
    assert out[1].clean_text == "other ending here"
    assert out[2].clean_text.startswith("fully original")
    assert out[2].n_removed == 0
    assert out[3].clean_text == "" and out[3].n_removed == 5


def test_remove_duplicate_spans_short_docs_untouched(spark):
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in C.remove_duplicate_spans(df).collect()}
    # shorter than the span: no full-length gram, nothing removed even
    # though the full text is duplicated
    assert out[0].clean_text == "tiny doc" and out[0].n_removed == 0


def test_retrieval_metrics_hand_computed(spark):
    # exact top-3 for one query: ids 10, 11, 12 (ranks 1..3)
    exact = spark.createDataFrame(
        [(1, 10, 1.0, 1), (1, 11, 0.9, 2), (1, 12, 0.8, 3)],
        ["query_id", "vec_id", "score", "rank"],
    )
    # approx returns 11 (rank 1), 10 (rank 2), 99 (rank 3, miss)
    approx = spark.createDataFrame(
        [(1, 11, 0.9, 1), (1, 10, 1.0, 2), (1, 99, 0.1, 3)],
        ["query_id", "vec_id", "score", "rank"],
    )
    row = S.retrieval_metrics(exact, approx, k=3).collect()[0]
    g = S.dcg_gain_table(3)
    idcg = g[0] + g[1] + g[2]
    assert row.n_hits == 2
    assert abs(row.mrr - 0.5) < 1e-9  # exact-NN found at rank 2
    assert abs(row.ndcg - round((g[0] + g[1]) / idcg, 6)) < 1e-9


def test_retrieval_metrics_zero_hit_query(spark):
    exact = spark.createDataFrame(
        [(1, 10, 1.0, 1), (2, 20, 1.0, 1)],
        ["query_id", "vec_id", "score", "rank"],
    )
    approx = spark.createDataFrame(
        [(1, 10, 1.0, 1), (2, 99, 0.5, 1)],
        ["query_id", "vec_id", "score", "rank"],
    )
    rows = {r.query_id: r for r in S.retrieval_metrics(exact, approx, k=1).collect()}
    assert rows[1].mrr == 1.0 and rows[1].ndcg == 1.0
    assert rows[2].mrr == 0.0 and rows[2].ndcg == 0.0 and rows[2].n_hits == 0


def test_cross_source_overlap_counts(spark):
    df = spark.createDataFrame(
        [
            (0, "shared one", "a"),
            (1, "shared one", "b"),
            (2, "shared one", "c"),
            (3, "pairwise", "a"),
            (4, "pairwise", "b"),
            (5, "lonely", "a"),
            (6, "shared one", "a"),  # same (source, content) twice: distinct
        ],
        ["doc_id", "text", "source"],
    )
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in D.cross_source_overlap(df).collect()
    }
    # 'shared one' links all three pairs; 'pairwise' adds to (a, b)
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_source_quota_caps_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(20)] + [(100, "small")],
        ["doc_id", "source"],
    )
    out = C.source_quota(df, max_per_group=5)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r.doc_id)
    assert len(per["big"]) == 5 and per["small"] == [100]
    assert all(r.quota_rank <= 5 for r in rows)
    again = {tuple(sorted(r.doc_id for r in C.source_quota(df, 5).collect()))}
    assert again == {tuple(sorted(r.doc_id for r in rows))}


def test_oov_rate_with_tiny_vocab(spark):
    from postgresimporter_spark.operators import textstats as T

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a z z z")], ["doc_id", "text"]
    )
    # vocab_size=1 -> top token is 'a' (freq 3 vs b:1, z:3 -> tie a/z
    # broken lexicographically: 'a' wins)
    out = {r.doc_id: r for r in T.oov_rate(df, vocab_size=1).collect()}
    assert out[0].n_tokens == 3 and out[0].n_oov == 1
    assert out[1].n_tokens == 4 and out[1].n_oov == 3
    assert abs(out[1].oov_rate - 0.75) < 1e-9


def test_semdedup_drops_farther_duplicate(spark):
    # cell geometry: centroid c0 = +x; v10 exactly on axis, v11 a
    # tau-similar copy slightly off-axis (farther from centroid), v12
    # orthogonal (kept)
    centroids = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])]
    rows = [
        (10, [1.0, 0.0, 0.0]),
        (11, [1.0, 0.05, 0.0]),   # cos(v10,v11) ~ 0.99875 >= tau
        (12, [0.2, 1.0, 0.0]),    # same cell, dissimilar
        (20, [0.0, 0.0, 1.0]),    # other cell
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in S.semdedup(df, centroids, tau=0.95).collect()}
    assert set(out) == {10, 12, 20}  # 11 dropped: closer twin exists
    assert out[10].cell == 0 and out[20].cell == 1


def test_semdedup_identical_vectors_keep_lowest_id(spark):
    centroids = [(0, [1.0, 0.0])]
    df = spark.createDataFrame(
        [(5, [1.0, 0.2]), (3, [1.0, 0.2]), (9, [1.0, 0.2])],
        ["vec_id", "embedding"],
    )
    kept = sorted(r.vec_id for r in S.semdedup(df, centroids).collect())
    assert kept == [3]


def test_lifecycle_operators_handle_empty_inputs(spark):
    """Empty corpora must yield empty results, not errors (the
    pagerank ZeroDivision class of bug — ADVICE r02)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    docs_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    empty_docs = spark.createDataFrame([], docs_schema)
    emb_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    empty_emb = spark.createDataFrame([], emb_schema)
    some_docs = spark.createDataFrame(
        [(1, "a b c d e f")], docs_schema
    )

    index = D.minhash_band_index(empty_docs)
    assert D.minhash_match_index(index, some_docs).count() == 0
    full_index = D.minhash_band_index(some_docs)
    assert D.minhash_match_index(full_index, empty_docs).count() == 0
    assert C.remove_duplicate_spans(empty_docs).count() == 0
    assert C.source_quota(
        empty_docs.withColumn("source", F.lit("s")), 5
    ).count() == 0
    assert S.semdedup(empty_emb, [(0, [1.0, 0.0])]).count() == 0
    from postgresimporter_spark.operators.textstats import oov_rate

    assert oov_rate(empty_docs).count() == 0


def test_merge_topk_equals_full_recompute_with_ties(spark):
    """topk(A∪B) == topk(topk(A) ∪ topk(B)) — including score ties
    across the merge boundary (duplicate vector, higher id in B)."""
    hist = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    # batch: exact duplicate of vec 5 (ties its score) + one new best
    batch = spark.createDataFrame(
        [(105, [6.0, 1.0]), (106, [100.0, 1.0])],
        ["vec_id", "embedding"],
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], ["query_id", "embedding"]
    )
    k = 4
    prev = S.brute_force_topk(hist, queries, k=k)
    merged = S.merge_topk(prev, batch, queries, k=k)
    full = S.brute_force_topk(
        hist.unionByName(batch), queries, k=k
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_topk_is_idempotent_on_replay(spark):
    """Re-merging an already-merged batch must be a no-op (at-least-
    once delivery upstream composes to exactly-once standings)."""
    hist = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(5)],
        ["vec_id", "embedding"],
    )
    batch = spark.createDataFrame(
        [(100, [50.0, 1.0])], ["vec_id", "embedding"]
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], ["query_id", "embedding"]
    )
    prev = S.brute_force_topk(hist, queries, k=3)
    once = S.merge_topk(prev, batch, queries, k=3)
    twice = S.merge_topk(once, batch, queries, k=3)
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_simhash_combo_size_validation(spark):
    import pytest as _pytest

    fps = spark.createDataFrame([(1, 7)], ["id", "simhash"])
    with _pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_hamming_pairs(
            fps, bits=32, chunks=4, max_hamming=2, combo_size=3
        )


def test_minhash_match_index_with_hot_shingle_cap(spark):
    boiler = "terms of service apply here now "
    hist = spark.createDataFrame(
        [
            (0, boiler + "alpha beta gamma delta epsilon zeta"),
            (1, boiler + "completely different content with other words"),
        ],
        ["doc_id", "text"],
    )
    # batch must be large enough that its OWN document frequencies
    # separate boilerplate (in all docs) from content (in one doc) —
    # the docstring's small-batch caveat is real: a 1-doc batch at
    # ratio 0.9 drops every shingle it has
    batch = spark.createDataFrame(
        [
            (100, boiler + "alpha beta gamma delta epsilon zeta extra"),
            (101, boiler + "unrelated fresh words nothing shared one"),
            (102, boiler + "more novel material nothing common two"),
        ],
        ["doc_id", "text"],
    )
    index = D.minhash_band_index(hist, max_doc_ratio=0.9)
    out = D.minhash_match_index(
        index, batch, threshold=0.5, max_doc_ratio=0.9
    )
    assert {(r.new_id, r.hist_id) for r in out.collect()} == {(100, 0)}


def test_phrase_search_overlapping_and_boundaries(spark):
    from postgresimporter_spark.operators.textindex import phrase_search

    df = spark.createDataFrame(
        [
            (0, "a a a b"),       # "a a" at 0 and 1 (overlapping)
            (1, "b a a"),         # at 1
            (2, "a b a"),         # no contiguous "a a"
            (3, "x y z"),         # no tokens from phrase at all
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.start_pos)
        for r in phrase_search(df, ["a", "a"]).collect()
    )
    assert got == [(0, 0), (0, 1), (1, 1)]

    single = sorted(
        (r.doc_id, r.start_pos)
        for r in phrase_search(df, ["b"]).collect()
    )
    assert single == [(0, 3), (1, 0), (2, 1)]


def test_minhash_match_index_stop_shingles_one_doc_batch(spark):
    """The persisted drop list closes the small-batch footgun: a 1-doc
    probe against a hot-shingle-capped index matches correctly when
    probed with the HISTORY's stop list (its own ratio estimate would
    drop every shingle it has)."""
    boiler = "terms of service apply here now "
    hist = spark.createDataFrame(
        [
            (0, boiler + "alpha beta gamma delta epsilon zeta"),
            (1, boiler + "completely different content with other words"),
            (2, boiler + "third unrelated history document entirely new"),
        ],
        ["doc_id", "text"],
    )
    stop = D.hot_shingles(hist, max_doc_ratio=0.9).localCheckpoint()
    assert stop.count() > 0  # boilerplate shingles detected
    index = D.minhash_band_index(hist, stop_shingles=stop)
    batch = spark.createDataFrame(
        [(100, boiler + "alpha beta gamma delta epsilon zeta extra")],
        ["doc_id", "text"],
    )
    out = D.minhash_match_index(
        index, batch, threshold=0.5, stop_shingles=stop
    )
    assert {(r.new_id, r.hist_id) for r in out.collect()} == {(100, 0)}


def test_semdedup_duplicate_families_match_bruteforce(spark):
    """Value-level SemDeDup must reproduce the row-level drop rule
    exactly on a corpus with exact-duplicate families, including the
    equal-centroid_sim id tie-breaks WITHIN and ACROSS families
    (round-10 rewrite: the 10x-duplicated sf0.1 probe never finished
    row-level; this pins output equality on the tricky shapes)."""
    import itertools
    import random

    from postgresimporter_spark.operators.similarity import semdedup

    rng = random.Random(42)
    centroids = [
        (0, [1.0] + [0.0] * 7),
        (1, [0.0, 1.0] + [0.0] * 6),
    ]
    base = []
    for i in range(12):
        v = [rng.uniform(-1, 1) for _ in range(8)]
        base.append(v)
    rows = []
    rid = 0
    for i, v in enumerate(base):
        for _ in range(1 + (i % 3)):  # families of size 1, 2, 3
            rows.append((rid, v))
            rid += 1
    # two distinct ids sharing ANOTHER doc's exact vector, interleaved
    # ids -> cross-family equal-centroid_sim ties
    rows.append((rid, base[0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    got = {
        r.vec_id
        for r in semdedup(df, centroids, tau=0.8).collect()
    }

    # brute force: the paper rule, row-at-a-time in python
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    def assign(v):
        scored = [(cos(v, c), -cid) for cid, c in centroids]
        s, negcid = max(scored)
        return -negcid, round(s, 6)

    meta = {i: assign(v) for i, v in rows and [(i, v) for i, v in rows]}
    want = set()
    for i, v in rows:
        cell_i, cs_i = meta[i]
        dropped = False
        for j, w in rows:
            if i == j:
                continue
            cell_j, cs_j = meta[j]
            if cell_j != cell_i:
                continue
            if cos(v, w) < 0.8:
                continue
            if cs_j > cs_i or (cs_j == cs_i and j < i):
                dropped = True
                break
        if not dropped:
            want.add(i)
    assert got == want and want
