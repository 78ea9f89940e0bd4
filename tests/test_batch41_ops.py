"""Batch-41 operators: unit semantics against hand-computed models,
plus physical-plan shape pins (mirroring test_plans_round4.py)."""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def plan_of(spark, reg, name):
    return physical_plan(reg[name].fn(spark, SF))


# ---------------------------------------------------------------------------
# semantics
# ---------------------------------------------------------------------------


def test_mutual_topk_semantics(spark):
    from postgresimporter_spark.operators.similarity import mutual_topk_pairs

    # 4 vectors in one LSH bucket (all-positive signs): 0~1 are a
    # tight pair and 2~3 are each other's nearest; with k=1 exactly
    # those two mutual pairs survive — the cross pairs (0,2), (1,3),
    # ... are one-sided at best and must be filtered
    rows = [
        (0, [1.0, 0.1, 1.0, 0.1]),
        (1, [1.0, 0.11, 1.0, 0.11]),
        (2, [1.0, 1.0, 0.2, 0.2]),
        (3, [0.2, 1.0, 0.2, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(
        mutual_topk_pairs(df, k=1, bands=1, bits_per_band=4).collect(),
        key=lambda r: (r.id_a, r.id_b),
    )
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1), (2, 3)]
    assert all(r.rank_ab == 1 and r.rank_ba == 1 for r in out)

    # k=3 on 4 mutually-candidate vectors: every pair is mutual
    out3 = mutual_topk_pairs(df, k=3, bands=1, bits_per_band=4).collect()
    assert len(out3) == 6


def test_weighted_jaccard_exact_and_cap_independent(spark):
    from postgresimporter_spark.operators.dedup import weighted_jaccard_pairs

    # doc0: a x3, b x1 ; doc1: a x1, b x1 -> min 1+1=2, max 3+1=4 -> 0.5
    # doc2 shares nothing with 0/1
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b"), (2, "c c d")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r
        for r in weighted_jaccard_pairs(df, threshold_micro=0).collect()
    }
    assert set(out) == {(0, 1)}
    r = out[(0, 1)]
    assert (r.min_sum, r.tot_a, r.tot_b) == (2, 4, 2)
    assert r.wjacc_micro == 500_000

    # the hot-token cap prunes candidates only — a pair that still
    # shares a rare token keeps its EXACT all-token score: 'a' occurs
    # in 2/3 docs (0.67 > 0.5 -> dropped as candidate key), 'b' in 2/3
    # too; with ratio 0.7 both survive; with ratio 0.5 none survive ->
    # no candidates at all (honest recall loss), never a changed score
    capped = weighted_jaccard_pairs(
        df, threshold_micro=0, max_doc_ratio=0.7
    ).collect()
    assert [(r.id_a, r.id_b, r.wjacc_micro) for r in capped] == [
        (0, 1, 500_000)
    ]
    none = weighted_jaccard_pairs(
        df, threshold_micro=0, max_doc_ratio=0.5
    ).collect()
    assert none == []


def test_median_of_means_resists_outlier(spark):
    from postgresimporter_spark.operators.robust import median_of_means

    # 64 well-behaved rows worth ~10.00 plus one 1e6 outlier: the
    # plain mean explodes, the median of 16 bucket means stays ~10
    rows = [(i, "k", 10.0) for i in range(64)] + [(64, "k", 1_000_000.0)]
    df = spark.createDataFrame(rows, "event_id long, k string, value double")
    out = median_of_means(
        df, ["k"], "value", "event_id", n_buckets=16
    ).collect()[0]
    assert out.n_rows == 65
    assert out.mom_scaled == 10_000_000  # exactly 10.0 in micro
    assert out.mean_scaled > 15_000_000_000  # mean dragged over 15k


def test_median_of_means_matches_python_model(spark):
    import hashlib

    from postgresimporter_spark.operators.robust import median_of_means

    rows = [(i, "g", float(i % 7) + 0.25) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, k string, value double")
    out = median_of_means(
        df, ["k"], "value", "event_id", n_buckets=8
    ).collect()[0]

    # independent model with the same md5 bucketing + integer math
    buckets: dict[int, list[int]] = {}
    for i, _, v in rows:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 8
        buckets.setdefault(b, []).append(round(v * 100))
    bmeans = sorted(
        (sum(vs) * 10_000 // len(vs), b) for b, vs in buckets.items()
    )
    nb = len(bmeans)
    lo, hi = (nb + 1) // 2, nb // 2 + 1
    central = [bm for bm, _ in bmeans][lo - 1 : hi]
    assert out.mom_scaled == sum(central) // len(central)
    total = sum(v for vs in buckets.values() for v in vs)
    assert out.mean_scaled == total * 10_000 // 100


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_q216_equi_join_only(spark, reg):
    plan = plan_of(spark, reg, "q216_mutual_knn")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q217_bounded_nested_loops(spark, reg):
    # the only nested-loop joins are broadcast 1-row aggregates
    # (corpus size for the hot-token cap)
    plan = plan_of(spark, reg, "q217_weighted_jaccard")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_q218_no_global_window(spark, reg):
    from test_plans import unpartitioned_windows

    plan = plan_of(spark, reg, "q218_median_of_means")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not unpartitioned_windows(plan)


def test_q219_single_scan(spark, reg):
    plan = plan_of(spark, reg, "q219_path_rollup")
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q220_single_scan_one_broadcast(spark, reg):
    plan = plan_of(spark, reg, "q220_decayed_topk")
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row max date
