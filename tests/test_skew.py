"""Skew-injection tests (VERDICT r02 #7): synthetic hot-key fixtures
prove the banded joins' caps bound candidate-pair counts sub-quadratic
under pathological skew — a hot shingle shared by every document, a hot
LSH band bucket holding the whole corpus, a mega-container basket
(the container case lives in test_graph.py::test_cooccurrence_max_container_size).

Each test measures the *candidate* set (threshold=0 so verification
passes everything): uncapped the fixture degenerates to all-pairs
C(n,2); capped it collapses to only the pairs a discriminating key
still links.
"""

from __future__ import annotations

from postgresimporter_spark.operators.dedup import ngram_jaccard_pairs
from postgresimporter_spark.operators.similarity import signband_neardup_pairs


def test_hot_shingle_cap_bounds_candidates(spark):
    # 40 docs, each = one shared stop-phrase + a unique 5-word tail.
    # The phrase's 3-gram shingles appear in ALL docs (df ratio 1.0);
    # the tails share nothing. Uncapped: every pair meets -> C(40,2).
    # Capped at 50%: hot shingles dropped before the join -> 0 pairs.
    n = 40
    rows = [
        (i, f"the quick brown fox u{i}a u{i}b u{i}c u{i}d u{i}e")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = ngram_jaccard_pairs(df, threshold=0.0, n=3)
    assert uncapped.count() == n * (n - 1) // 2
    capped = ngram_jaccard_pairs(df, threshold=0.0, n=3, max_doc_ratio=0.5)
    assert capped.count() == 0


def test_hot_shingle_cap_keeps_rare_links(spark):
    # Two docs also share a RARE phrase: the cap must keep their pair
    # while dropping the all-pairs degenerate mass.
    n = 30
    rows = []
    for i in range(n):
        tail = f"u{i}a u{i}b u{i}c u{i}d u{i}e"
        if i in (3, 7):  # rare shared 3-grams between docs 3 and 7
            tail = "rare shared marker phrase " + tail
        rows.append((i, f"the quick brown fox {tail}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = ngram_jaccard_pairs(df, threshold=0.0, n=3, max_doc_ratio=0.5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(3, 7)}


def test_hot_bucket_cap_bounds_candidates(spark):
    # 30 all-positive vectors: every sign bit is 1, so every band
    # bucket holds the whole corpus. Uncapped: all pairs meet ->
    # C(30,2). Capped at 10%: every bucket is hot -> 0 candidates.
    n = 30
    rows = [(i, [float(1 + (i + d) % 7) for d in range(16)]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    uncapped = signband_neardup_pairs(df, threshold=0.0)
    assert uncapped.count() == n * (n - 1) // 2
    capped = signband_neardup_pairs(df, threshold=0.0, max_bucket_ratio=0.1)
    assert capped.count() == 0


def test_hot_bucket_cap_keeps_rare_band_pairs(spark):
    # Mostly-positive corpus, but two vectors share a distinctive
    # negative-sign pattern in band 0 (a rare bucket): their pair must
    # survive the hot-bucket cap via that band alone.
    n = 20
    rows = []
    for i in range(n):
        vec = [float(1 + (i + d) % 5) for d in range(16)]
        if i in (2, 9):
            vec[0], vec[2] = -1.0, -2.0  # rare band-0 key for this pair
        rows.append((i, vec))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = signband_neardup_pairs(df, threshold=0.0, max_bucket_ratio=0.2)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(2, 9)}


def test_salted_topk_per_key_equals_plain_under_hot_key(spark):
    """2-phase salted top-k must return EXACTLY the plain window's
    result; the hot key's phase-1 sort spreads across salt buckets."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.ranking import topk_per_key

    rows = [("hot", i, i * 7 % 1000) for i in range(5000)] + [
        ("cold%d" % j, i, i) for j in range(5) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "key string, rid long, score long")
    order = [F.desc("score"), F.asc("rid")]
    plain = topk_per_key(df, ["key"], order, k=4)
    salted = topk_per_key(
        df, ["key"], order, k=4, salt_buckets=8, salt_on=["rid"]
    )
    a = {(r.key, r.rid, r.rk) for r in plain.collect()}
    b = {(r.key, r.rid, r.rk) for r in salted.collect()}
    assert a == b
    assert len({r for r in a if r[0] == "hot"}) == 4
    # both phases present in the salted plan
    from postgresimporter_spark.operators.bucketing import physical_plan

    assert physical_plan(salted).count("Window [") >= 2


def test_hot_band_cap_bounds_simhash_candidates(spark):
    """Identical fingerprints put the whole corpus in every combo band
    (the correlated-fingerprint skew shape at 100 TB). Uncapped: all
    pairs meet (hamming 0) -> C(n,2). Capped at 50%: every band is hot,
    dropped pre-join -> 0 pairs, and hot_bands() reports exactly the
    dropped keys with the full corpus count."""
    from postgresimporter_spark.operators.dedup import (
        hot_bands,
        simhash_hamming_pairs,
    )

    n = 60
    fps = spark.createDataFrame(
        [(i, 0x5A5A5A5A) for i in range(n)], "id long, simhash long"
    )
    uncapped = simhash_hamming_pairs(fps)
    assert uncapped.count() == n * (n - 1) // 2
    capped = simhash_hamming_pairs(fps, max_band_ratio=0.5)
    assert capped.count() == 0
    dropped = hot_bands(fps, max_band_ratio=0.5).collect()
    assert dropped and all(r.n_fingerprints == n for r in dropped)


def test_hot_band_cap_keeps_rare_band_pairs(spark):
    """A near-dup pair whose agreement combos are RARE keys must
    survive the cap while the degenerate identical mass is dropped."""
    from postgresimporter_spark.operators.dedup import simhash_hamming_pairs

    n = 40
    rows = [(i, 0x5A5A5A5A) for i in range(n)]
    # pair (100, 101): a distinct fingerprint family, 1 bit apart
    rows += [(100, 0x0F0F1234), (101, 0x0F0F1235)]
    fps = spark.createDataFrame(rows, "id long, simhash long")
    capped = simhash_hamming_pairs(fps, max_band_ratio=0.5)
    got = {(r.id_a, r.id_b, r.hamming) for r in capped.collect()}
    assert got == {(100, 101, 1)}


def test_hot_band_cap_ratio_one_is_identity(spark):
    """max_band_ratio=1.0 can never drop a key (freq <= n always), so
    the capped result must equal the uncapped result exactly."""
    from postgresimporter_spark.operators.dedup import simhash_hamming_pairs

    rows = [(i, (i * 2654435761) % (1 << 32)) for i in range(50)]
    rows += [(200, 0x12345678), (201, 0x12345679)]
    fps = spark.createDataFrame(rows, "id long, simhash long")
    a = {tuple(r) for r in simhash_hamming_pairs(fps).collect()}
    b = {
        tuple(r)
        for r in simhash_hamming_pairs(fps, max_band_ratio=1.0).collect()
    }
    assert a == b and (200, 201, 1) in a


def test_hot_band_cap_is_prejoin_aggregate(spark):
    """The cap must be a frequency aggregate BELOW the pair self-join
    (filtering keyed rows before they shuffle into quadratic buckets),
    not a filter over the join output: the capped plan carries the
    (chunk, val) count aggregate as an extra join input, and the
    self-join's direct children are the band-key joins, not a raw
    explode."""
    from postgresimporter_spark.operators.bucketing import physical_plan
    from postgresimporter_spark.operators.dedup import simhash_hamming_pairs

    fps = spark.createDataFrame(
        [(i, i * 97) for i in range(20)], "id long, simhash long"
    )
    import re

    capped = physical_plan(simhash_hamming_pairs(fps, max_band_ratio=0.5))
    n_joins = lambda p: sum(p.count(j) for j in (
        "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    # cold-key filter joins once under EACH side of the self-join, on
    # top of the pair join itself (the uncapped plan is no longer a
    # comparable baseline: it takes the distinct-value-compressed
    # layout with its own expansion joins)
    assert n_joins(capped) >= 3
    # and the frequency aggregate keyed on the band key sits in the
    # plan (the pre-join cold-key filter's input)
    assert re.search(r"HashAggregate\(keys=\[chunk[^\]]*val", capped)


def test_hot_band_cap_on_lookup_combo_path(spark):
    """Same skew guard semantics on the LARGE-combo lookup path
    (round-7: C(16,6)=8008 broadcast combos + xxhash64 keys, the image
    pHash config): identical 64-bit fingerprints are dropped by the
    cap, a rare near pair survives, and hot_bands() reports the full
    corpus count on every dropped key."""
    from postgresimporter_spark.operators.dedup import (
        hot_bands,
        simhash_hamming_pairs,
    )

    n = 30
    rows = [(i, 0x5A5A5A5A5A5A5A5A - (1 << 63)) for i in range(n)]
    rows += [(100, 0x0F0F123400000000 - (1 << 63)),
             (101, 0x0F0F123400000400 - (1 << 63))]
    fps = spark.createDataFrame(rows, "id long, simhash long")
    kw = dict(bits=64, chunks=16, max_hamming=10)
    capped = simhash_hamming_pairs(fps, max_band_ratio=0.5, **kw)
    got = {(r.id_a, r.id_b, r.hamming) for r in capped.collect()}
    assert got == {(100, 101, 1)}
    dropped = hot_bands(fps, max_band_ratio=0.5, **kw).collect()
    assert dropped and all(r.n_fingerprints == n for r in dropped)


def test_simhash_pairs_value_compression_equals_bruteforce(spark):
    """The distinct-value-compressed uncapped path returns exactly the
    brute-force Hamming pair set — heavy duplicate families included
    (the compression's raison d'être) — for several seeded corpora."""
    import random

    from postgresimporter_spark.operators.dedup import simhash_hamming_pairs

    for seed in (7, 23):
        rng = random.Random(seed)
        base = [rng.getrandbits(31) for _ in range(12)]
        fps = []
        i = 0
        for b in base:
            for _ in range(rng.randint(1, 5)):  # duplicate families
                v = b ^ (1 << rng.randrange(32) if rng.random() < 0.5 else 0)
                fps.append((i, v))
                i += 1
        df = spark.createDataFrame(fps, "id long, simhash long")
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_hamming_pairs(
                df, bits=32, chunks=4, max_hamming=3
            ).collect()
        }
        want = {
            (a, b, bin(x ^ y).count("1"))
            for a, x in fps
            for b, y in fps
            if a < b and bin(x ^ y).count("1") <= 3
        }
        assert got == want
