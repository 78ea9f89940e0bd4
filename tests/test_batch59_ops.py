"""Batch-59: MIH Hamming join, trigram LIKE, inter-arrival KS fit, and
multi-probe recall vs independent Python models at sf0.001."""

from __future__ import annotations

import math

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_mih_exact_vs_brute_force(spark):
    from postgresimporter_spark.operators.dedup import hamming_pairs_mih

    import random

    rnd = random.Random(42)
    base = [rnd.getrandbits(64) for _ in range(40)]
    fps = dict(enumerate(base))
    # seed guaranteed near pairs at assorted radii
    for i, r in enumerate([1, 4, 7, 10]):
        v = base[i]
        for b in rnd.sample(range(64), r):
            v ^= 1 << b
        fps[100 + i] = v
    rows = [(k, v - (1 << 64) if v >= 1 << 63 else v) for k, v in fps.items()]
    df = spark.createDataFrame(rows, "id long, simhash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_pairs_mih(
            df, bits=64, blocks=4, max_hamming=10
        ).collect()
    }
    ids = sorted(fps)
    want = {
        (a, b, _hamming(fps[a], fps[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _hamming(fps[a], fps[b]) <= 10
    }
    assert got == want
    assert len(want) >= 4  # the seeded pairs are actually in range


def test_mih_raises_on_huge_probe_neighborhood(spark):
    from postgresimporter_spark.operators.dedup import hamming_pairs_mih

    df = spark.createDataFrame([(1, 7)], "id long, simhash long")
    with pytest.raises(ValueError, match="max_probe_masks"):
        # blocks=2 -> width 32, per-block radius 5 -> 242825 masks
        hamming_pairs_mih(df, bits=64, blocks=2, max_hamming=10)


def test_trigram_like_matches_python_scan(spark, reg):
    from postgresimporter_spark.operators.textindex import (
        trigram_like_search,
    )
    from postgresimporter_spark.plans.catalog_batch59 import LIKE_PATTERNS
    from postgresimporter_spark.sources.parquet import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"]
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want = {
        (p, d) for p in LIKE_PATTERNS for d, t in texts.items() if p in t
    }
    got = {
        (r.pattern, r.doc_id)
        for r in reg["q285_trigram_like"].fn(spark, SF).collect()
    }
    assert got == want
    assert want  # patterns were chosen to actually match
    # an absent pattern yields no rows (its trigrams have df=0)
    none = trigram_like_search(docs, ["zzqzzq"]).collect()
    assert none == []
    with pytest.raises(ValueError, match="shorter than a trigram"):
        trigram_like_search(docs, ["ab"])


def test_q286_matches_python_model(spark, reg):
    from postgresimporter_spark.sources.parquet import load_tables

    ev = load_tables(spark, SF, ["events"])["events"]
    rows = sorted(
        ((r.user_id, r.ts, r.event_id) for r in ev.collect()),
        key=lambda t: (t[0], t[1], t[2]),
    )
    gaps = []
    for i in range(1, len(rows)):
        if rows[i][0] == rows[i - 1][0]:
            delta = rows[i][1] - rows[i - 1][1]
            gaps.append(
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds
            )
    n, s = len(gaps), sum(gaps)
    lam = n / s
    levels = {}
    for g in gaps:
        levels[g] = levels.get(g, 0) + 1
    d = 0.0
    c = 0
    for v in sorted(levels):
        cnt = levels[v]
        model = 1.0 - math.exp(-lam * v)
        d = max(
            d,
            round(max(abs((c + cnt) / n - model), abs(c / n - model)), 6),
        )
        c += cnt
    row = reg["q286_interarrival_fit"].fn(spark, SF).collect()[0]
    assert row.n_gaps == n
    assert row.sum_gap_us == s
    assert row.ks_d == pytest.approx(d, abs=1e-9)


def test_q287_multiprobe_never_worse(spark, reg):
    row = reg["q287_multiprobe_recall"].fn(spark, SF).collect()[0]
    assert row.n_truth == 50  # 5 queries x k=10
    assert 0 <= row.hit_single <= row.hit_multi <= row.n_truth


def test_trigram_plan_shape(spark, reg):
    """The pattern/probe side must ride broadcasts and nothing may
    degenerate to a cartesian — the rarest-first probe discipline is
    only real if the plan keeps the pattern side small."""
    from postgresimporter_spark.operators.bucketing import physical_plan

    plan = physical_plan(reg["q285_trigram_like"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan  # no row-wise Python anywhere


def test_mih_align_cols_vs_brute_force(spark):
    """align_cols semantics: exactly the pairs of the plain MIH join
    whose align column is EQUAL on both rows — including duplicate
    fingerprint values spread across and within align groups (the hot
    static-frame shape the align key exists for)."""
    import random

    from postgresimporter_spark.operators.dedup import hamming_pairs_mih

    rnd = random.Random(7)
    base = [rnd.getrandbits(64) for _ in range(12)]
    near = []
    for i in range(4):  # near partners at radii 1/3/7/10
        v = base[i]
        for b in rnd.sample(range(64), [1, 3, 7, 10][i]):
            v ^= 1 << b
        near.append(v)
    vals = base + near
    rows = []
    for i in range(120):  # duplicates: each value recurs ~7x
        v = vals[i % len(vals)]
        rows.append(
            (f"id{i:03d}", i % 5, v - (1 << 64) if v >= 1 << 63 else v)
        )
    df = spark.createDataFrame(rows, "id string, slot int, simhash long")
    got = {
        (r.id_a, r.id_b, r.slot, r.hamming)
        for r in hamming_pairs_mih(
            df,
            bits=64,
            blocks=4,
            max_hamming=10,
            id_col="id",
            hash_col="simhash",
            align_cols=["slot"],
        ).collect()
    }
    want = set()
    for i, (ia, sa, va) in enumerate(rows):
        for ib, sb, vb in rows[i + 1 :]:
            if sa == sb and _hamming(va, vb) <= 10:
                want.add((min(ia, ib), max(ia, ib), sa, _hamming(va, vb)))
    assert got == want
    assert len(want) > 50  # dup families + near partners both present


def test_mih_align_cols_rejects_reserved_names(spark):
    from postgresimporter_spark.operators.dedup import hamming_pairs_mih

    df = spark.createDataFrame([(1, 2, 7)], "id long, fp long, simhash long")
    with pytest.raises(ValueError, match="align_cols"):
        hamming_pairs_mih(df, align_cols=["fp"])


def test_mih_align_cols_null_matches_nothing(spark):
    """A NULL align value matches nothing (SQL equality semantics,
    ADVICE r10): two identical fingerprints with null slots pair
    neither with each other nor with non-null slots."""
    from postgresimporter_spark.operators.dedup import hamming_pairs_mih

    rows = [
        ("a", 1, 42), ("b", 1, 42),       # pair (equal slot)
        ("c", None, 42), ("d", None, 42), # null slots: no pairs
        ("e", 2, 42),                     # lone slot: no partner
    ]
    df = spark.createDataFrame(rows, "id string, slot int, simhash long")
    got = {
        (r.id_a, r.id_b)
        for r in hamming_pairs_mih(
            df, bits=64, blocks=4, max_hamming=10,
            id_col="id", hash_col="simhash", align_cols=["slot"],
        ).collect()
    }
    assert got == {("a", "b")}
