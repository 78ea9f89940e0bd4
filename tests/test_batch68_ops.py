"""Batch-68: k-truss peeling on a known micro-graph and farthest-first
seeding vs hand arithmetic."""

from __future__ import annotations


def test_ktruss_k4_plus_pendant(spark):
    """K4 edges each close 2 triangles -> the 4-truss (support >= 2)
    keeps exactly K4; the pendant edge (no triangles) peels in round
    one and never resurrects."""
    from postgresimporter_spark.operators.graph import ktruss_edges

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "src long, dst long")
    got = {
        (r.src, r.dst): r.support
        for r in ktruss_edges(edges, k=4, rounds=2).collect()
    }
    assert got == {e: 2 for e in k4}


def test_ktruss_peeling_cascades(spark):
    """A triangle glued to K4 by one shared edge: the triangle's outer
    edges have support 1, peel at k=4, and their removal does NOT
    reduce K4 below threshold."""
    from postgresimporter_spark.operators.graph import ktruss_edges

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tri = [(2, 7), (3, 7)]  # (2,3) shared with K4
    edges = spark.createDataFrame(k4 + tri, "src long, dst long")
    got = {
        (r.src, r.dst)
        for r in ktruss_edges(edges, k=4, rounds=2).collect()
    }
    assert got == set(k4)


def test_kcenter_seeding_hand_arithmetic(spark, tmp_path):
    """3 one-hot-ish vectors: seed 0 = min vec_id; each next seed is
    the point farthest from the chosen set, with the exact quantized
    squared distance reported."""
    import pandas as pd

    from postgresimporter_spark.plans.catalog_batch68 import (
        q310_kcenter_seeding,
    )

    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[0.0, 0.0], [0.001, 0.0], [0.01, 0.0]],
            "label": [0, 0, 0],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "embeddings.parquet"))
    rows = {
        r.seed_rank: (r.vec_id, r.sel_dist2)
        for r in q310_kcenter_seeding(spark, str(sf)).collect()
    }
    # quantized: 0 -> 0, 0.001 -> 1, 0.01 -> 10
    assert rows[0] == (0, 0)
    assert rows[1] == (2, 100)  # farthest from {0}: 10^2
    assert rows[2] == (1, 1)  # farthest remaining: min(1, 81) = 1


def test_mih_match_index_equals_oneshot_join(spark):
    """The incremental probe (stored index x new batch) finds exactly
    the pairs the one-shot hamming_pairs_mih finds between batch and
    history — same pigeonhole layout, split into build/probe halves."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.operators.dedup import (
        hamming_pairs_mih,
        mih_block_index,
        mih_match_index,
    )

    hist = spark.createDataFrame(
        [(i, (i * 37) % 256) for i in range(40)], "id long, simhash long"
    )
    batch = spark.createDataFrame(
        [(100 + i, ((i * 37) % 256) ^ (1 << (i % 3))) for i in range(10)],
        "id long, simhash long",
    )
    idx = mih_block_index(hist, bits=16, blocks=2)
    got = {
        (r.new_id, r.hist_id, r.hamming)
        for r in mih_match_index(
            idx, batch, bits=16, blocks=2, max_hamming=4
        ).collect()
    }
    both = hist.unionByName(batch)
    ref = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.hamming)
        for r in hamming_pairs_mih(
            both, bits=16, blocks=2, max_hamming=4
        ).collect()
        if (r.id_a >= 100) != (r.id_b >= 100)
    }
    assert got == ref and got


def test_mih_match_index_duplicate_batch_rows_distinct_pairs(spark):
    """A batch carrying duplicate (id, fingerprint) ROWS (un-deduped
    ingest / replayed micro-batch) still emits DISTINCT (new_id,
    hist_id) pairs — the pre-value-level-dedup output contract,
    restored by the final pair-level dropDuplicates (ADVICE r9)."""
    from postgresimporter_spark.operators.dedup import (
        mih_block_index,
        mih_match_index,
    )

    hist = spark.createDataFrame(
        [(i, (i * 37) % 256) for i in range(40)], "id long, simhash long"
    )
    # every batch row duplicated 3x, including the id
    rows = [(100 + i, ((i * 37) % 256) ^ 1) for i in range(10)]
    batch = spark.createDataFrame(rows * 3, "id long, simhash long")
    got = [
        (r.new_id, r.hist_id)
        for r in mih_match_index(
            mih_block_index(hist, bits=16, blocks=2),
            batch,
            bits=16,
            blocks=2,
            max_hamming=4,
        ).collect()
    ]
    assert got and len(got) == len(set(got))
