"""Batch-65: HLL rollup merge semantics and weighted-MinHash sketch
properties on hand-built fixtures."""

from __future__ import annotations


def test_hll_rollup_merge_equals_single_key(spark):
    """The 'ALL' row merged from per-key registers must equal the
    single-key sketch over the same values (register max is exactly
    how one sketch would have absorbed the union), including on
    overlapping key populations."""
    from postgresimporter_spark.operators.sketches import (
        hll_portable,
        hll_rollup,
    )

    rows = [("a", v) for v in range(200)] + [
        ("b", v) for v in range(100, 400)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    rolled = {
        r.scope: (r.hit_registers, r.z_scaled, r.est_distinct)
        for r in hll_rollup(df, "k", "v").collect()
    }
    single = hll_portable(df, [], "v").collect()[0]
    assert rolled["ALL"] == (
        single.hit_registers,
        single.z_scaled,
        single.est_distinct,
    )
    # per-key rows present and distinct from the union
    assert set(rolled) == {"a", "b", "ALL"}
    assert rolled["a"] != rolled["ALL"]


def test_hll_rollup_nulls_excluded(spark):
    from postgresimporter_spark.operators.sketches import hll_rollup

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 1)], "k string, v long"
    )
    rows = {r.scope: r.hit_registers for r in hll_rollup(df, "k", "v").collect()}
    assert rows["a"] == rows["b"] == rows["ALL"] == 1


def test_weighted_minhash_identical_and_disjoint(spark):
    """Identical documents band together with signature agreement 1.0
    and exact clipped weighted Jaccard 1.0; token-disjoint documents
    never pair. The repeated-token doc scores below 1.0 against its
    single-occurrence sibling (weight-awareness — plain set MinHash
    would call them identical)."""
    from postgresimporter_spark.operators.dedup import (
        weighted_minhash_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "alpha alpha alpha beta gamma delta"),
            (4, "zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): (r.est_wjaccard, r.wjaccard)
        for r in weighted_minhash_pairs(docs, threshold=0.4).collect()
    }
    assert pairs[(1, 2)] == (1.0, 1.0)
    assert all(4 not in p for p in pairs)
    if (1, 3) in pairs:
        est, exact = pairs[(1, 3)]
        # clipped weights: min-sum 4, max-sum 6
        assert exact == round(4 / 6, 6)
        assert est < 1.0
