"""Round-9 property tests (hypothesis, VERDICT r08 #5): the
distinct-value-compressed Hamming joins — ``hamming_pairs_mih`` and
the combo-band ``simhash_hamming_pairs`` — equal a brute-force
all-pairs Python model for generated fingerprint corpora across the
three distribution shapes that stress the compression differently:

- **uniform** (values ~= rows: compression is a no-op, the plan must
  still be exact),
- **concentrated** (few duplicate families, many near-copies: the
  shape whose quadratic bucket blow-up the round-8 rework fixed —
  value compression collapses families, id-expansion must restore
  every pair including intra-family hamming-0 ones),
- **power-law** (one hot value + a long tail: both hot-bucket and
  singleton paths in the same corpus).

The round-8 rework is guarded by seeded-corpus tests; these close the
loop so the NEXT layout change can't silently trade exactness either.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

BITS = 16


@st.composite
def _corpus(draw) -> list[int]:
    """A fingerprint list drawn from one of three distribution shapes."""
    shape = draw(st.sampled_from(["uniform", "concentrated", "powerlaw"]))
    n = draw(st.integers(6, 32))
    full = st.integers(0, 2**BITS - 1)
    if shape == "uniform":
        return [draw(full) for _ in range(n)]
    if shape == "concentrated":
        # 1-3 duplicate families; each member flips <= 2 random bits
        bases = [draw(full) for _ in range(draw(st.integers(1, 3)))]
        out = []
        for _ in range(n):
            fp = bases[draw(st.integers(0, len(bases) - 1))]
            for _ in range(draw(st.integers(0, 2))):
                fp ^= 1 << draw(st.integers(0, BITS - 1))
            out.append(fp)
        return out
    # powerlaw: value rank r appears with weight ~ 1/(r+1)
    bases = [draw(full) for _ in range(6)]
    ranks = st.sampled_from([0, 0, 0, 0, 1, 1, 2, 2, 3, 4, 5])
    return [bases[draw(ranks)] for _ in range(n)]


def _brute(fps: list[int], h: int) -> dict[tuple[int, int], int]:
    """All-pairs ground truth: {(id_a, id_b): hamming} with id_a < id_b."""
    out = {}
    for (ia, fa), (ib, fb) in itertools.combinations(enumerate(fps), 2):
        d = bin(fa ^ fb).count("1")
        if d <= h:
            out[(ia, ib)] = d
    return out


def _got(df) -> dict[tuple[int, int], int]:
    rows = df.collect()
    got = {}
    for r in rows:
        key = (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        assert key not in got, f"duplicate pair {key}"
        got[key] = r.hamming
    return got


@settings(max_examples=20, deadline=None)
@given(_corpus())
def test_mih_equals_bruteforce(spark, fps):
    """MIH (distinct-value compression + verify-before-dedup +
    id-expansion) returns exactly the brute-force pair set with exact
    distances, for every distribution shape."""
    from postgresimporter_spark.operators.dedup import hamming_pairs_mih

    df = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(fps)], "id long, simhash long"
    )
    got = _got(
        hamming_pairs_mih(df, bits=BITS, blocks=2, max_hamming=3)
    )
    assert got == _brute(fps, 3)


@settings(max_examples=20, deadline=None)
@given(_corpus())
def test_simhash_combo_band_equals_bruteforce(spark, fps):
    """The combo-band join (value-compressed uncapped path, combo
    keys = 2-chunk concatenations) returns exactly the brute-force
    pair set — pigeonhole exactness survives the compression."""
    from postgresimporter_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    df = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(fps)], "id long, simhash long"
    )
    got = _got(
        simhash_hamming_pairs(
            df, bits=BITS, chunks=4, max_hamming=2, combo_size=2
        )
    )
    assert got == _brute(fps, 2)


@settings(max_examples=10, deadline=None)
@given(_corpus())
def test_simhash_plain_banding_equals_bruteforce(spark, fps):
    """combo_size=1 (plain single-chunk banding, the row-level layout)
    agrees with the same model — both layouts remain exact."""
    from postgresimporter_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    df = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(fps)], "id long, simhash long"
    )
    got = _got(
        simhash_hamming_pairs(
            df, bits=BITS, chunks=4, max_hamming=3, combo_size=1
        )
    )
    assert got == _brute(fps, 3)


@settings(max_examples=15, deadline=None)
@given(_corpus(), _corpus())
def test_mih_match_index_equals_bruteforce(spark, hist_fps, batch_fps):
    """The incremental stored-index probe (value-compressed batch side,
    round 9) returns exactly the brute-force batch x history match set,
    for every history/batch distribution combination."""
    from postgresimporter_spark.operators.dedup import (
        mih_block_index,
        mih_match_index,
    )

    hist = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(hist_fps)], "id long, simhash long"
    )
    batch = spark.createDataFrame(
        [(1000 + i, fp) for i, fp in enumerate(batch_fps)],
        "id long, simhash long",
    )
    idx = mih_block_index(hist, bits=BITS, blocks=2)
    got = {
        (r.new_id, r.hist_id): r.hamming
        for r in mih_match_index(
            idx, batch, bits=BITS, blocks=2, max_hamming=3
        ).collect()
    }
    expected = {}
    for bi, bfp in enumerate(batch_fps):
        for hi, hfp in enumerate(hist_fps):
            d = bin(bfp ^ hfp).count("1")
            if d <= 3:
                expected[(1000 + bi, hi)] = d
    assert got == expected
