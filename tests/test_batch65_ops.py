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


def _wmh_row_level(docs, num_hashes=16, band_size=4, threshold=0.5,
                   max_rep=8):
    """The pre-r10 row-level weighted-MinHash layout, kept as the
    brute reference for the value-level rewrite (same discipline as
    the semdedup / audio near-dup equality tests)."""
    from pyspark.sql import functions as F

    cnts = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.least(F.count("*"), F.lit(max_rep)).cast("int").alias("c"))
        .localCheckpoint(eager=False)
    )
    units = cnts.select(
        "id", "tok", F.explode(F.sequence(F.lit(1), F.col("c"))).alias("rep")
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("k")
    unit_hash = F.md5(
        F.concat_ws(":", F.lit("wmh"), F.col("k"), F.col("tok"), F.col("rep"))
    )
    sig = (
        units.select("id", "tok", "rep", ks)
        .select("id", "k", unit_hash.alias("_h"))
        .groupBy("id", "k")
        .agg(F.min("_h").alias("minh"))
        .localCheckpoint(eager=False)
    )
    band_key = F.md5(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("k"), F.col("minh")))),
                lambda s: s["minh"],
            ),
        )
    )
    bands = sig.groupBy(
        "id", (F.col("k") / band_size).cast("int").alias("band")
    ).agg(band_key.alias("bkey"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), on=["band", "bkey"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        cand.join(
            sig.select(F.col("id").alias("id_a"), "k", F.col("minh").alias("_ma")),
            on="id_a",
        )
        .join(
            sig.select(
                F.col("id").alias("_idb"),
                F.col("k").alias("_kb"),
                F.col("minh").alias("_mb"),
            ),
            on=[F.col("id_b") == F.col("_idb"), F.col("k") == F.col("_kb")],
        )
        .groupBy("id_a", "id_b")
        .agg(
            (
                F.sum(F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0))
                / F.lit(float(num_hashes))
            ).alias("_frac")
        )
        .where(F.col("_frac") >= threshold)
    )
    tot = cnts.groupBy("id").agg(F.sum("c").cast("long").alias("t"))
    minsum = (
        est.select("id_a", "id_b")
        .join(cnts.select(F.col("id").alias("id_a"), "tok", F.col("c").alias("_ca")), on="id_a")
        .join(
            cnts.select(
                F.col("id").alias("_idb"),
                F.col("tok").alias("_tb"),
                F.col("c").alias("_cb"),
            ),
            on=[F.col("id_b") == F.col("_idb"), F.col("tok") == F.col("_tb")],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("_ca", "_cb")).cast("long").alias("_ms"))
    )
    return (
        est.join(minsum, on=["id_a", "id_b"])
        .join(tot.select(F.col("id").alias("id_a"), F.col("t").alias("_ta")), on="id_a")
        .join(tot.select(F.col("id").alias("id_b"), F.col("t").alias("_tb2")), on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round("_frac", 4).alias("est_wjaccard"),
            F.round(
                F.col("_ms")
                / (F.col("_ta") + F.col("_tb2") - F.col("_ms")).cast("double"),
                6,
            ).alias("wjaccard"),
        )
    )


def test_weighted_minhash_duplicate_families(spark):
    """The r10 value-level rewrite must match the row-level layout
    EXACTLY (both scores) on a duplicate-family corpus: 3x copies of
    each text under shifted ids, including a repeated-token sibling
    (distinct value, high overlap), a disjoint loner, a NULL text
    (never pairs — no tokens), and an empty text family (pairs with
    itself at 1.0 — row-level bands the '' token)."""
    from postgresimporter_spark.operators.dedup import (
        weighted_minhash_pairs,
    )

    base = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha alpha alpha beta gamma delta"),
        (3, "zeta eta theta iota"),
        (4, None),
        (5, ""),
    ]
    rows = [
        (doc_id + 100 * j, text) for doc_id, text in base for j in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    ref = sorted(tuple(r) for r in _wmh_row_level(docs, threshold=0.3).collect())
    got = sorted(
        tuple(r)
        for r in weighted_minhash_pairs(docs, threshold=0.3).collect()
    )
    assert got == ref
    got_d = {(a, b): (e, w) for a, b, e, w in got}
    # within-family pairs: both scores exactly 1.0, C(3,2) per family
    for fam in (1, 2, 3, 5):
        fam_pairs = [
            (a, b) for (a, b) in got_d
            if a % 100 == fam and b % 100 == fam
        ]
        assert len(fam_pairs) == 3
        assert all(got_d[p] == (1.0, 1.0) for p in fam_pairs)
    # NULL-text family never pairs
    assert all(a % 100 != 4 and b % 100 != 4 for (a, b) in got_d)
