"""Unit tests for the north-star operators on hand-built micro-fixtures
(the oracle check covers fixture-scale behavior; these pin semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.operators import dedup as D
from postgresimporter_spark.operators import similarity as S
from postgresimporter_spark.operators import textstats as T


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_exact_dedup_keeps_min_id(spark):
    df = docs_df(spark, ["aaa", "bbb", "aaa", "aaa"])
    got = {r.doc_id: r.n_copies for r in D.exact_dedup(df).collect()}
    assert got == {0: 3, 1: 1}


def test_shingles(spark):
    df = docs_df(spark, ["a b c d", "a b"])
    got = [
        r[0]
        for r in df.orderBy("doc_id")
        .select(D.shingles(F.col("text"), 3))
        .collect()
    ]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than n -> single truncated shingle


def test_jaccard_identical_docs(spark):
    df = docs_df(spark, ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "zz yy xx ww vv"])
    pairs = D.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert len(pairs) == 1
    assert (pairs[0].id_a, pairs[0].id_b, pairs[0].jaccard) == (0, 1, 1.0)


def test_minhash_lsh_finds_identical_docs(spark):
    texts = [f"word{i} " * 20 for i in range(10)]
    texts.append(texts[0])  # 10 == 0
    pairs = D.minhash_lsh_pairs(docs_df(spark, texts), threshold=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 10)}
    assert pairs[0].est_jaccard == 1.0


def test_simhash_identical_and_different(spark):
    df = docs_df(spark, ["alpha beta gamma", "alpha beta gamma", "zeta eta theta"])
    got = {r.id: r.simhash for r in D.simhash(df).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_cosine_topk_self_is_rank_one(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = S.brute_force_topk(emb, q, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in got] == [0, 1, 2]
    assert got[0].score == 1.0


def test_lang_id_markers(spark):
    df = docs_df(
        spark,
        [
            "the cat and the dog is here",
            "der hund ist nicht hier und da",
            "xyzzy plugh",
        ],
    )
    got = [
        r[0]
        for r in df.orderBy("doc_id")
        .select(T.predict_language(F.col("text")))
        .collect()
    ]
    assert got == ["en", "de", "und"]


def test_quality_features_blank_text(spark):
    df = docs_df(spark, ["", "  ", "one two, three!"])
    rows = {
        r.doc_id: r
        for r in T.quality_features(df).collect()
    }
    assert rows[0].n_tokens == 0
    assert rows[1].n_tokens == 0
    assert rows[2].n_tokens == 3
    assert rows[2].punct_ratio > 0


def test_connected_components_chain_and_star(spark):
    from postgresimporter_spark.operators.components import (
        connected_components,
        dedup_clusters,
    )

    # chain 1-2-3, star 10-(11,12,13), singleton pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13), (20, 21)],
        ["id_a", "id_b"],
    )
    cc = {r.id: r.component for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    clusters = {
        r.component: r.cluster_size for r in dedup_clusters(pairs).collect()
    }
    assert clusters == {1: 3, 10: 4, 20: 2}


def test_connected_components_long_chain_converges(spark):
    from postgresimporter_spark.operators.components import (
        connected_components,
    )

    # a 30-node chain needs ~log-n doubling rounds; must converge < cap
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    cc = connected_components(pairs).collect()
    assert {r.component for r in cc} == {0}
    assert len(cc) == 31


def test_connected_components_nonconvergence_raises(spark):
    """r12 no-silent-caps: exhausting max_iterations without a
    fixpoint means WRONG cluster labels — it must raise, never return
    a partial result (the convergent path is untouched)."""
    import pytest

    from postgresimporter_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1).collect()


def test_connected_components_rejects_nonpositive_iterations(spark):
    """ADVICE r12: max_iterations <= 0 skipped the loop body entirely,
    so the for/else raise hit an unbound n_changed (NameError); it must
    be a clear ValueError up front."""
    import pytest

    from postgresimporter_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="max_iterations"):
        connected_components(pairs, max_iterations=0)


def test_jaccard_doc_frequency_cap(spark):
    # 'x y z' trigram appears in every doc -> capped out; docs 0/1 share
    # ONLY that universal shingle, docs 2/3 share a rare tail
    texts = [
        "x y z a1 a2 a3",
        "x y z b1 b2 b3",
        "x y z c1 c2 c3 tail1 tail2 tail3",
        "x y z d1 d2 d3 tail1 tail2 tail3",
    ]
    df = docs_df(spark, texts)
    uncapped = D.ngram_jaccard_pairs(df, threshold=0.01)
    capped = D.ngram_jaccard_pairs(df, threshold=0.01, max_doc_ratio=0.9)
    un_pairs = {(p.id_a, p.id_b) for p in uncapped.collect()}
    cap_pairs = {(p.id_a, p.id_b) for p in capped.collect()}
    # uncapped: every pair is a candidate via the universal shingle
    assert (0, 1) in un_pairs
    # capped: the universal shingle is dropped; only the rare-tail pair
    # (and pairs sharing partially-universal shingles) survive
    assert (0, 1) not in cap_pairs
    assert (2, 3) in cap_pairs


def test_lsh_multiprobe_improves_recall(spark):
    from postgresimporter_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from postgresimporter_spark.plans.catalog_northstar import PLANES

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(df):
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    r_single = recall(lsh_topk(emb, queries, PLANES, k=5))
    r_multi = recall(lsh_topk(emb, queries, PLANES, k=5, multiprobe=True))
    assert r_multi >= r_single
    # deterministic fixture + planes: observed 0.4 multi vs lower single;
    # absolute recall is geometry-dependent, the bound just guards collapse
    assert r_multi >= 0.35


def test_funnel_ordering_and_window(spark):
    import datetime as dt

    from postgresimporter_spark.operators.funnel import funnel

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, uid, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        # user 1: full ordered funnel inside the hour
        ev(1, 1, "view", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 20),
        # user 2: purchase BEFORE click -> only reaches click
        ev(4, 2, "view", 0), ev(5, 2, "purchase", 5), ev(6, 2, "click", 10),
        # user 3: click outside the 60-min window
        ev(7, 3, "view", 0), ev(8, 3, "click", 90),
        # user 4: never viewed
        ev(9, 4, "click", 0), ev(10, 4, "purchase", 5),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        r.event_type: r.n_users
        for r in funnel(df, ["view", "click", "purchase"], 60).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_retention_offsets(spark):
    import datetime as dt

    from postgresimporter_spark.operators.funnel import retention

    d0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def ev(i, uid, days):
        return (i, d0 + dt.timedelta(days=days), uid, "view", 1.0, "{}")

    rows = [
        ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 3),
        ev(4, 2, 0), ev(5, 2, 0),  # same-day dup counts once
        ev(6, 3, 1), ev(7, 3, 2),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        (r.cohort_day.day, r.day_offset): r.n_users
        for r in retention(df).collect()
    }
    assert got == {
        (1, 0): 2,  # users 1,2 on day 1
        (1, 1): 1,  # user 1 back next day
        (1, 3): 1,
        (2, 0): 1,  # user 3 cohort day 2
        (2, 1): 1,
    }


def test_exact_ntile_matches_window_ntile(spark):
    """exact_ntile must be bit-identical to SQL NTILE(k) — including the
    first-(n mod k)-buckets-get-one-extra sizing and tie splits at
    bucket boundaries — for n%k!=0, n<k, and duplicate keys."""
    import random

    from pyspark.sql import Window

    from postgresimporter_spark.operators.ranking import exact_ntile

    rng = random.Random(41)
    for n, k in [(103, 4), (3, 5), (40, 4), (1, 1)]:
        rows = [(i, rng.randrange(10)) for i in range(n)]  # heavy ties
        df = spark.createDataFrame(rows, ["id", "v"])
        got = {
            r.id: r.bucket
            for r in exact_ntile(df, ["v", "id"], k).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r.id: r.nt
            for r in df.withColumn(
                "nt", F.ntile(k).over(w).cast("long")
            ).collect()
        }
        assert got == want, (n, k)


def test_global_row_number_total_and_dense(spark):
    from postgresimporter_spark.operators.ranking import global_row_number

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], ["id", "v"]
    )
    out = global_row_number(df, ["v", "id"], num_partitions=8).collect()
    assert sorted(r.row_idx for r in out) == list(range(1, 51))
    assert all(r.n_total == 50 for r in out)
    in_order = sorted(out, key=lambda r: (r.v, r.id))
    assert [r.row_idx for r in in_order] == list(range(1, 51))


def test_global_row_number_local_index_cap_raises(spark, monkeypatch):
    """The 2^33-row monotonically_increasing_id local-index cap is
    guarded LOUDLY (r14, VERDICT r13 #5): a range partition over the
    cap raises instead of silently wrapping ranks into the partition-id
    bits. Exercised by shrinking the module cap — 2^33 real rows are
    not buildable in a test."""
    import pytest

    from postgresimporter_spark.operators import ranking

    monkeypatch.setattr(ranking, "_LOCAL_INDEX_CAP", 4)
    df = spark.createDataFrame([(i,) for i in range(40)], ["id"])
    with pytest.raises(Exception, match="local-index cap"):
        ranking.global_row_number(df, ["id"], num_partitions=2).collect()
    # under the cap the guard is invisible: same ranks as ever
    monkeypatch.setattr(ranking, "_LOCAL_INDEX_CAP", 1 << 33)
    out = ranking.global_row_number(df, ["id"], num_partitions=2).collect()
    assert sorted(r.row_idx for r in out) == list(range(1, 41))


def _brute_edit_pairs(rows, d):
    """Driver-side reference Levenshtein join (fixture-sized only)."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            dd = lev(ta, tb)
            if dd <= d:
                out.add((min(ia, ib), max(ia, ib), dd))
    return out


def test_edit_distance_pairs_lossless_vs_bruteforce(spark):
    """The q-gram count filter must be recall-lossless: result equals
    the naive quadratic join on mixed-length strings with indels,
    substitutions, short strings (below the filterable length), and
    duplicate grams."""
    from postgresimporter_spark.operators.linkage import edit_distance_pairs

    rows = [
        (1, "charlotte"), (2, "charlotte"), (3, "charlottes"),
        (4, "sharlotte"), (5, "charlie"), (6, "karlotta"),
        (7, "aaaaaa"), (8, "aaaaab"), (9, "aabaaa"),
        (10, "ab"), (11, "ba"), (12, "b"), (13, ""),
        (14, "mississippi"), (15, "mississipi"), (16, "missisippi"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        (r.id_a, r.id_b, r.edit_distance)
        for r in edit_distance_pairs(df, max_dist=2).collect()
    }
    assert got == _brute_edit_pairs(rows, 2)


def test_edit_distance_candidates_subquadratic_on_same_length_names(spark):
    """VERDICT r01: length-blocking was degenerate on fixed-width names.
    On a diverse corpus where EVERY name has the same length, the gram
    filter must still produce far fewer candidates than n^2/2."""
    import random

    from postgresimporter_spark.operators.linkage import (
        edit_distance_candidates,
        edit_distance_pairs,
    )

    rng = random.Random(80)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(12)))
        for i in range(100)
    ]
    # plant a few true near-duplicates
    rows[50] = (50, rows[0][1][:-1] + "q")
    rows[51] = (51, rows[1][1][:6] + "xx" + rows[1][1][8:])
    df = spark.createDataFrame(rows, ["id", "text"])
    n_cand = edit_distance_candidates(df, max_dist=2).count()
    assert n_cand < 100 * 99 / 2 * 0.05, n_cand  # <5% of all pairs
    got = {
        (r.id_a, r.id_b, r.edit_distance)
        for r in edit_distance_pairs(df, max_dist=2).collect()
    }
    assert got == _brute_edit_pairs(rows, 2)
    assert (0, 50, 1) in got and (1, 51, 2) in got


def test_minhash_doc_frequency_cap(spark):
    """Hot shingles drag every doc's minima toward the same values; the
    cap must stop boilerplate-only overlap from producing LSH pairs
    while keeping genuinely-duplicated docs paired."""
    texts = [
        "x y z w v u t s r q p o " + tail  # 12 hot tokens, 3-token tail
        for tail in [
            "a1 a2 a3",
            "b1 b2 b3",
            "c1 c2 c3",
            "dup1 dup2 dup3",
            "dup1 dup2 dup3",
        ]
    ]
    df = docs_df(spark, texts)
    uncapped = {
        (p.id_a, p.id_b)
        for p in D.minhash_lsh_pairs(df, threshold=0.3).collect()
    }
    capped = {
        (p.id_a, p.id_b)
        for p in D.minhash_lsh_pairs(
            df, threshold=0.3, max_doc_ratio=0.5
        ).collect()
    }
    # boilerplate-only pairs survive without the cap...
    assert any(a < 3 and b < 3 for a, b in uncapped)
    # ...and vanish with it; the true duplicate pair stays
    assert not any(a < 3 and b < 3 for a, b in capped)
    assert (3, 4) in capped


def test_tfidf_join_paths_agree(spark):
    """The df-table join gate (auto / forced-broadcast / forced-shuffle)
    must not change results — only the physical join strategy."""
    from postgresimporter_spark.operators.bucketing import physical_plan
    from postgresimporter_spark.operators.textstats import tfidf_scores
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", ["documents"])[
        "documents"
    ]
    outs = {}
    for mode in ("auto", "broadcast", "shuffle"):
        df = tfidf_scores(docs, df_join=mode)
        outs[mode] = {
            (r.doc_id, r.token, r.tf, r.tfidf) for r in df.collect()
        }
    assert outs["auto"] == outs["broadcast"] == outs["shuffle"]
    # the forced-shuffle path really does avoid a broadcast of df_
    shuffle_plan = physical_plan(tfidf_scores(docs, df_join="shuffle"))
    assert "SortMergeJoin" in shuffle_plan


def test_inverted_index_postings_cap_and_counts(spark):
    from postgresimporter_spark.operators.textindex import inverted_index

    docs = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a c"),
            (3, "a b"),
            (4, "a"),
        ],
        "doc_id long, text string",
    )
    idx = {
        r.token: (r.df, r.cf, r.postings_sample)
        for r in inverted_index(docs, postings_sample=2).collect()
    }
    # 'a' appears in all 4 docs, 5 times total; sample capped at 2
    assert idx["a"] == (4, 5, "1,2")
    assert idx["b"] == (2, 2, "1,3")
    assert idx["c"] == (1, 1, "2")


def test_bm25_candidates_only_and_ordering(spark):
    from postgresimporter_spark.operators.textindex import (
        bm25_scores,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "nothing relevant here at all"),
        ],
        "doc_id long, text string",
    )
    scored = bm25_scores(docs, ["spark"]).collect()
    # doc 3 has zero query-term hits -> never a candidate
    assert {r.doc_id for r in scored} == {1, 2}
    top = bm25_topk(docs, ["spark"], k=1).collect()
    # higher tf at equal length -> higher score
    assert top[0].doc_id == 1
    by_id = {r.doc_id: r.score_micro for r in scored}
    assert by_id[1] > by_id[2] > 0


def test_frequent_items_exact_vs_naive_on_skewed_data(spark):
    """Two-phase frequent items == naive groupBy+filter on data with a
    heavy head and a long singleton tail, across partitionings."""
    from postgresimporter_spark.operators.frequent import (
        frequent_items,
        local_candidates,
    )

    rows = (
        [("hot",)] * 400
        + [("warm",)] * 80
        + [(f"tail_{i}",) for i in range(520)]
    )
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "v string").repartition(parts)
        got = {
            (r.value, r.cnt)
            for r in frequent_items(df, "v", k=20).collect()
        }
        naive = {
            (r.v, r.cnt)
            for r in df.groupBy("v")
            .agg(F.count("*").cast("long").alias("cnt"))
            .where(F.col("cnt") * 20 >= 1000)
            .collect()
        }
        assert got == naive == {("hot", 400), ("warm", 80)}
        # the local phase must prune the tail before any shuffle
        n_cand = local_candidates(df, "v", 20).distinct().count()
        assert n_cand < 30  # 522 distinct values, tail never emitted


def test_bloom_semi_join_exact_and_pruning(spark):
    from postgresimporter_spark.operators.bloom import (
        bloom_might_contain,
        bloom_semi_join,
        build_bloom,
    )

    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    dim = spark.range(0, 5000, 100).select(F.col("id").alias("k"))  # 50 keys
    got = {r.k for r in bloom_semi_join(fact, dim, "k").collect()}
    assert got == set(range(0, 5000, 100))
    # the prune alone: zero false negatives, and actually selective
    words = build_bloom(dim, "k")
    pruned = fact.where(bloom_might_contain(F.col("k"), words)).count()
    assert 50 <= pruned < 500  # all 50 members + <10% false positives


def test_jaccard_duplicate_families_match_row_level(spark):
    """Exact-duplicate documents (the crawl re-post shape): the
    value-level Jaccard join must emit exactly the row-level pair set
    — C(k,2) within-family pairs at 1.0 plus cross pairs — for both
    the full shingle join and the PPJoin prefix variant (round-10
    repro: 10x duplication measured 25s / 84s row-level vs ~3s
    value-level at sf0.1)."""
    import itertools

    from postgresimporter_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    t1 = "the quick brown fox jumps over the lazy dog today"
    t2 = "the quick brown fox jumps over the lazy dog tonight"  # near-dup
    t3 = "completely different text about spark and parquet files"
    rows = []
    for j in range(3):  # t1 and t3 duplicated 3x; t2 once
        rows.append((10 + j, t1))
        rows.append((30 + j, t3))
    rows.append((20, t2))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    want_within = set(itertools.combinations([10, 11, 12], 2)) | set(
        itertools.combinations([30, 31, 32], 2)
    )
    want_cross = {(10, 20), (11, 20), (12, 20)}

    for out in [
        ngram_jaccard_pairs(df, threshold=0.5),
        prefix_jaccard_pairs(df, threshold_pct=50),
    ]:
        got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
        assert set(got) == want_within | want_cross
        for p in want_within:
            assert got[p] == 1.0
        for p in want_cross:
            assert 0.5 <= got[p] < 1.0


def test_jaccard_duplicates_with_hot_shingle_cap(spark):
    """The hot-shingle document frequency weights each distinct text
    by its multiplicity, so the drop set matches the row-level join's
    count-distinct-ids semantics on duplicated corpora."""
    from postgresimporter_spark.operators.dedup import ngram_jaccard_pairs

    # one shared phrase appears in 6 of 7 docs (all copies), the rest
    # of each text is unique
    common = "click here to subscribe now"
    rows = []
    for j in range(3):
        rows.append((10 + j, f"{common} alpha beta gamma delta{j} x"))
        rows.append((20 + j, f"{common} epsilon zeta eta theta{j} y"))
    rows.append((99, "totally unrelated closing document text here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # cap at 0.5: shingles of the common phrase appear in 6/7 > 0.5 of
    # docs -> dropped; within-group near-dup pairs survive on their
    # unique tails only if those still clear the threshold (they
    # don't at 0.5), so only exact-dup self pairs remain... none exist
    # (texts differ by the j suffix) -> empty
    assert ngram_jaccard_pairs(df, threshold=0.5, max_doc_ratio=0.5).count() == 0
    # sanity: uncapped, the shared phrase creates candidates and the
    # within-group pairs clear 0.5 via the common prefix
    assert ngram_jaccard_pairs(df, threshold=0.5).count() > 0


def test_containment_and_wjaccard_duplicate_families(spark):
    """containment_pairs and weighted_jaccard_pairs under exact-dup
    families: value-level compression must emit the row-level pair
    set — within-family pairs at the perfect score (1.0 / 1,000,000
    micro with min_sum = tot_a = tot_b) plus cross pairs, with
    tot_a/tot_b following the id order (swap-aware expansion)."""
    import itertools

    from postgresimporter_spark.operators.dedup import weighted_jaccard_pairs
    from postgresimporter_spark.operators.mining import containment_pairs

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "alpha beta gamma delta epsilon zeta eta iota"  # near-dup
    rows = [(10 + j, t1) for j in range(3)] + [(20, t2)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    got_c = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    fam = set(itertools.combinations([10, 11, 12], 2))
    assert fam <= set(got_c)
    assert all(got_c[p] == 1.0 for p in fam)

    got_w = {
        (r.id_a, r.id_b): r
        for r in weighted_jaccard_pairs(df, threshold_micro=500_000).collect()
    }
    assert fam <= set(got_w)
    for p in fam:
        r = got_w[p]
        assert r.wjacc_micro == 1_000_000
        assert r.min_sum == r.tot_a == r.tot_b == 8
    # cross pair (near-dup, 7 of 8 tokens shared): 7/9 -> 777777 micro
    for a in (10, 11, 12):
        r = got_w[(a, 20)]
        assert (r.tot_a, r.tot_b) == (8, 8)
        assert r.wjacc_micro == 777_777


def test_inverted_index_salted_equals_plain(spark):
    """salt_buckets (the r10 hot-token path: postings sample via
    topk_per_key's two-phase min-k, df/cf via plain aggregates) must
    equal the plain single-window index row for row — including a
    stopword present in every doc and repeated tokens within a doc
    (cf > df)."""
    from postgresimporter_spark.operators.textindex import inverted_index

    docs = spark.createDataFrame(
        [
            (i, f"the quick w{i} the " + ("fox " * (i % 3)))
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    plain = {
        r.token: (r.df, r.cf, r.postings_sample)
        for r in inverted_index(docs, postings_sample=3).collect()
    }
    salted = {
        r.token: (r.df, r.cf, r.postings_sample)
        for r in inverted_index(
            docs, postings_sample=3, salt_buckets=8
        ).collect()
    }
    assert salted == plain
    assert plain["the"][0] == 200 and plain["the"][1] == 400
    assert plain["the"][2] == "0,1,2"


def test_inverted_index_salted_empty_sample(spark):
    """postings_sample=0: the plain path returns every token with an
    empty sample string; the salted path must too (left join +
    coalesce — an inner join dropped every token; r10 review fix)."""
    from postgresimporter_spark.operators.textindex import inverted_index

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    plain = {
        r.token: (r.df, r.cf, r.postings_sample)
        for r in inverted_index(docs, postings_sample=0).collect()
    }
    salted = {
        r.token: (r.df, r.cf, r.postings_sample)
        for r in inverted_index(
            docs, postings_sample=0, salt_buckets=4
        ).collect()
    }
    assert salted == plain
    assert set(plain) == {"a", "b", "c"}
    assert all(s == "" for _, _, s in plain.values())
