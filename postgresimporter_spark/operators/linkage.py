"""Record linkage: scalable edit-distance similarity self-join.

Round-1 q80 blocked the Levenshtein self-join on ``length(name)`` —
degenerate on fixed-width names (the whole table is one block ⇒
within-block cartesian; VERDICT r01 "What's wrong" #2). The scalable
replacement is the classic **q-gram count filter** (Gravano et al.,
"Approximate String Joins in a Database (Almost) for Free", VLDB 2001 —
public): one edit operation destroys at most ``q`` of a string's
``q``-grams, so

    ed(a, b) <= d  ⇒  |grams(a) ∩ grams(b)|  >=  max(|a|,|b|) − q + 1 − d·q

(multiset intersection). Candidates come from an *equi-join on grams*
— the same bucketed-candidate shape as the MinHash/shingle joins in
``dedup.py``, never an all-pairs join — then only candidates pay the
O(len²) Levenshtein verify. The filter is **lossless**: the final result
equals the naive quadratic join, so the DuckDB oracle can state the
plain definition while the Spark plan stays sub-quadratic.

Length prefilter: ``| |a| − |b| | <= d`` is also a lossless necessary
condition and prunes gram-join output early.

Strings too short for a positive count threshold
(``len < q·(d+1)``) can't be filtered by grams; they are paired
exhaustively among themselves (a bounded set in practice — and any
long⋈short pair with positive threshold fails the length prefilter
whenever it could matter). Hot grams (e.g. ``"00"`` in serial-number
text) concentrate the gram join the same way hot shingles do in the
Jaccard join; AQE skew-join handles moderate skew, and near-duplicate
corpora are inherently near-quadratic in their *output*, which no
complete algorithm avoids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(text, q: int):
    """Array of character q-grams (with duplicates — the multiset) —
    built with sequence/transform so the whole thing stays in codegen.
    The upper bound is clamped to >= 1: ``sequence(1, 0)`` is
    DESCENDING in Spark (invariant 8), which used to hand a
    string shorter than ``q`` a duplicated gram — harmless for the
    count filter's losslessness (it only inflated candidates) but a
    waste; a short string now contributes exactly one partial gram."""
    return F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(text) - (q - 1), F.lit(1))
        ),
        lambda i: text.substr(i, F.lit(q)),
    )


def edit_distance_candidates(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Candidate id pairs (id_a < id_b) that *may* be within
    ``max_dist`` edits: shared-q-gram count meets the count-filter
    threshold, or both strings are too short to filter.

    Returns columns ``id_a, id_b`` (distinct).
    """
    short_len = q * (max_dist + 1)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.length(text_col).alias("len"),
    )

    long_side = base.where(F.col("len") >= short_len)
    grams = (
        long_side.select(
            "id", "len", F.explode(_grams(F.col("text"), q)).alias("gram")
        )
        .groupBy("id", "len", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    a, b = grams.alias("a"), grams.alias("b")
    threshold = (
        F.greatest(F.col("a.len"), F.col("b.len"))
        - (q - 1)
        - max_dist * q
    )
    long_pairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id"))
            # lossless: length gap > d ⇒ edit distance > d
            & (
                F.abs(F.col("a.len") - F.col("b.len")) <= max_dist
            ),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .agg(
            F.sum(F.least(F.col("a.cnt"), F.col("b.cnt"))).alias("common"),
            F.first(threshold).alias("threshold"),
        )
        .where(F.col("common") >= F.col("threshold"))
        .select("id_a", "id_b")
    )

    short_side = base.where(F.col("len") < short_len)
    sa, sb = short_side.alias("sa"), short_side.alias("sb")
    short_pairs = sa.join(
        sb,
        (F.col("sa.id") < F.col("sb.id"))
        & (F.abs(F.col("sa.len") - F.col("sb.len")) <= max_dist),
    ).select(F.col("sa.id").alias("id_a"), F.col("sb.id").alias("id_b"))
    # short⋈long pairs within the length gap also bypass the gram filter
    mixed_pairs = sa.join(
        long_side.alias("lb"),
        F.abs(F.col("sa.len") - F.col("lb.len")) <= max_dist,
    ).select(
        F.least(F.col("sa.id"), F.col("lb.id")).alias("id_a"),
        F.greatest(F.col("sa.id"), F.col("lb.id")).alias("id_b"),
    )

    return long_pairs.unionByName(short_pairs).unionByName(mixed_pairs)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs within ``max_dist`` Levenshtein edits (id_a < id_b),
    exactly equal to the naive quadratic join, computed sub-quadratically.

    Returns ``id_a, id_b, edit_distance``.
    """
    named = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    cands = edit_distance_candidates(
        df, id_col=id_col, text_col=text_col, max_dist=max_dist, q=q
    )
    return (
        cands.join(
            named.select(
                F.col("id").alias("id_a"), F.col("text").alias("text_a")
            ),
            "id_a",
        )
        .join(
            named.select(
                F.col("id").alias("id_b"), F.col("text").alias("text_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("text_a", "text_b").cast("long").alias(
                "edit_distance"
            ),
        )
        .where(F.col("edit_distance") <= max_dist)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key: Column,
    window: int = 5,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): order
    records by a sort key, compare each record only with the next
    ``window`` records — O(n*w) candidates instead of O(n^2), the
    third classic blocking family next to q-gram count filtering
    (``edit_distance_candidates``) and LSH banding.

    Distributed shape: the global position comes from
    ``ranking.global_row_number`` (range-partition + offsets, no
    unpartitioned window); the neighborhood join is TWO equi-joins on
    a block id (``idx div window`` — a pair within ``window``
    positions spans at most two adjacent blocks), unioned and
    distance-filtered. No range join, no window over the full table;
    every stage is a hash join on a dense integer key.

    Returns candidate pairs (id_a, id_b, idx_a, idx_b) with
    idx_b - idx_a in [1, window]; callers apply their verify step
    (edit distance, Jaccard, equality) on this bounded set.
    """
    from .ranking import global_row_number

    keyed = df.select(
        F.col(id_col).alias("id"), key.alias("_key")
    )
    idx = global_row_number(
        keyed, ["_key", "id"], idx_col="idx",
        num_partitions=num_partitions,
    ).select(
        "id", "idx",
        F.expr(f"idx div {int(window)}").cast("long").alias("blk"),
    )

    a = idx.alias("a")

    def _near(shift: int) -> DataFrame:
        b = idx.select(
            "id", "idx", (F.col("blk") - shift).alias("blk")
        ).alias("b")
        return (
            a.join(b, on="blk")
            .where(
                (F.col("b.idx") > F.col("a.idx"))
                & (F.col("b.idx") <= F.col("a.idx") + window)
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.idx").alias("idx_a"),
                F.col("b.idx").alias("idx_b"),
            )
        )

    return _near(0).unionAll(_near(1))


__all__ = [
    "edit_distance_candidates",
    "edit_distance_pairs",
    "sorted_neighborhood_pairs",
    "deletion_neighborhood_pairs",
]


def deletion_neighborhood_pairs(
    terms: DataFrame,
    term_col: str = "term",
    max_term_len: int | None = 1000,
) -> DataFrame:
    """Edit-distance-1 term pairs via the SymSpell deletion
    neighborhood (Garbe's symmetric delete algorithm — public): each
    term generates itself plus its |term| single-character deletions,
    and two distinct terms are within edit distance 1 **iff** they
    share a neighborhood entry (substitution ⇒ both delete the
    differing position; insertion/deletion ⇒ the longer term's
    deletion IS the shorter term). Candidates therefore come from an
    equi-join on the variant string — |terms| × (len+1) keys, linear,
    never an all-pairs scan — and the Levenshtein verify merely
    confirms (the candidate set is exact, same lossless-filter
    contract as the q-gram join above).

    Returns (term_a < term_b, dist) with dist ∈ {1}.

    ``max_term_len`` (r12 probe): the neighborhood is O(len²) BYTES
    per term, built as ONE in-row array — a single un-tokenized blob
    that sneaked into the vocabulary (tokenizer failure, a normal web
    corpus hazard) stalls or OOMs the whole job on one task (measured
    at sf-independent probe scale: a lone 10,000-char term turned a
    9.6s job into 86s; a 40,000-char term did not finish 400s). Terms
    longer than the cap therefore RAISE executor-side with a named
    error — never a silent drop — telling the caller to pre-filter or
    raise the cap explicitly; ``None`` disables the guard. 1000 chars
    is far beyond any real vocabulary term and far below the hazard.
    """
    t = F.col(term_col)
    # empty/NULL terms are dropped up front: Spark's sequence(1, 0)
    # DESCENDS ([1, 0]) rather than yielding [], which would fabricate
    # variants for the empty string. DISTINCT terms before expanding:
    # the output is distinct STRING pairs, so duplicate input terms
    # would only replicate identical neighborhoods — and the variant
    # equi-join is quadratic in a term's multiplicity (a term repeated
    # k times, the vocabulary-from-corpus shape, costs k^2 candidate
    # rows per true pair before the dedup). Distinct on the TERM
    # column only (ADVICE r9): a multi-column frame (id + term) would
    # otherwise keep duplicate terms and silently defeat the k^2 fix.
    terms = terms.select(t.alias(term_col)).where(F.length(t) > 0).distinct()
    if max_term_len is not None:
        # the guard lives INSIDE the term column (a detached
        # assert_true column would be pruned as unused by Catalyst)
        terms = terms.select(
            F.when(
                F.length(t) > max_term_len,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "deletion_neighborhood_pairs: term of "
                            "length "
                        ),
                        F.length(t).cast("string"),
                        F.lit(
                            f" exceeds max_term_len={max_term_len}; "
                            "the deletion neighborhood is O(len^2) "
                            "bytes per term in one row — pre-filter "
                            "oversized terms or raise max_term_len"
                        ),
                    )
                ).cast("string"),
            )
            .otherwise(t)
            .alias(term_col)
        )
    variants = F.concat(
        F.array(t),
        F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.concat(
                F.substring(t, F.lit(1), i - 1),
                t.substr(i + 1, F.length(t)),
            ),
        ),
    )
    e = terms.select(t.alias("_t"), F.explode(variants).alias("_v"))
    a = e.select(F.col("_t").alias("term_a"), "_v")
    b = e.select(F.col("_t").alias("term_b"), "_v")
    cand = (
        a.join(b, on="_v")
        .where(F.col("term_a") < F.col("term_b"))
        .select("term_a", "term_b")
        .dropDuplicates(["term_a", "term_b"])
    )
    dist = F.levenshtein(F.col("term_a"), F.col("term_b"))
    return cand.where(dist <= 1).select(
        "term_a", "term_b", dist.cast("long").alias("dist")
    )
