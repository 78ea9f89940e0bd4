"""Bloom-filter-pruned semi-join: filter a huge fact table against a
compact bit-set of the dimension keys before the exact join.

At 100 TB the expensive part of ``fact SEMI JOIN dim`` is shuffling
fact rows whose keys aren't in dim at all.  A Bloom filter built from
the dim keys is a few KiB of longs; shipped to every scan task as a
literal, it rejects most non-matching rows AT THE SCAN, so only
probable matches reach the join.  False positives are removed by the
exact join that follows — the final result is bit-identical to the
plain semi-join (which is why the catalog query needs no special
oracle).  This mirrors Spark's own runtime bloom pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) but as an
explicit, engine-independent operator with md5-derived positions.

Determinism: bit positions are ``md5(i ':' key)`` slices mod m — no
JVM hash dependence, so the same filter is reproducible anywhere.

The build collects only the SET BIT POSITIONS (<= m_bits integers,
metadata-scale) to the driver — never the keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """k deterministic bit positions for a key: md5 of the salted key,
    first 15 hex chars (60 bits, exact in a long) mod m."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k_hashes)
    ]


def build_bloom(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 13, k_hashes: int = 3
) -> list[int]:
    """Build the filter distributed-side: explode each key's bit
    positions, distinct them (<= m_bits values), and fold into
    ``m_bits / 64`` longs on the driver."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64: {m_bits}")
    pos = (
        dim.select(
            F.explode(
                F.array(*_positions(F.col(key_col), m_bits, k_hashes))
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        words[r.pos >> 6] |= 1 << (r.pos & 63)
    # two's-complement into signed 64-bit so each word fits a Spark long
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int = 1 << 13, k_hashes: int = 3
) -> Column:
    """Membership predicate: every hash position's bit is set.  The
    word array is a literal, so the whole test runs inside codegen at
    the scan — no join, no shuffle, no Python."""
    arr = F.array(*[F.lit(w) for w in words])
    # single-bit masks as signed longs (bit 63 is the sign bit)
    masks = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63))
            for j in range(64)
        ]
    )
    cond = F.lit(True)
    for pos in _positions(key, m_bits, k_hashes):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        mask = F.element_at(masks, (pos % 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m_bits: int = 1 << 13,
    k_hashes: int = 3,
) -> DataFrame:
    """``fact SEMI JOIN dim`` with a Bloom pre-filter on the fact scan.

    Exact: the Bloom pass only prunes; surviving false positives are
    removed by the real semi-join.  The dim side is read twice (once
    to build the filter, once to join) — at scale the build is a
    column-pruned scan of just the key column.
    """
    dim_key = dim_key or fact_key
    words = build_bloom(dim, dim_key, m_bits, k_hashes)
    pruned = fact.where(
        bloom_might_contain(F.col(fact_key), words, m_bits, k_hashes)
    )
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pruned.join(keys, on=fact_key, how="left_semi")
