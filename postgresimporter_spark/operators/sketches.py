"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 3.5+/4 as ``hll_sketch_agg`` / ``hll_union_agg``).

Why sketches at 100 TB: an exact ``countDistinct`` over a high-
cardinality key shuffles every distinct value once per grouping you
ever ask for. A sketch is computed ONCE per fine-grained cell (say,
per day × source), stored as a few-KB binary, and any coarser rollup
(per month, per source, global) is a cheap merge of the stored
sketches — no rescan, no re-shuffle of raw data. The binary is the
standard DataSketches format, so other engines (Druid, Hive, BigQuery)
can merge the same bytes.

No DuckDB oracle applies (approximate, engine-specific estimates), so
these ship as operators with property tests (estimate within the HLL
error envelope of exact; merged == global) rather than catalog queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lgConfigK=12 -> 4 KB sketches, ~1.6% relative standard error: the
# DataSketches default and the right size/accuracy trade for rollups.
DEFAULT_LG_K = 12


def distinct_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Per-group HLL sketch + its estimate for ``value_col``.

    One shuffle on the grouping key with map-side partial sketches
    (sketches are commutative monoids — Spark plans a partial_merge).
    Keep ``key_cols`` at the finest grain you'll ever roll up from.
    """
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    out = df.groupBy(*key_cols).agg(sk)
    return out.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("long")
    )


def rollup_sketches(
    sketches: DataFrame,
    key_cols: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Merge stored sketches up to a coarser key (possibly ``[]`` for a
    global estimate) WITHOUT touching raw data — the whole point of
    persisting the binary column."""
    merged = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    grouped = (
        sketches.groupBy(*key_cols).agg(merged)
        if key_cols
        else sketches.agg(merged)
    )
    return grouped.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("long")
    )


def approx_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, rsd: float = 0.016
) -> Column | DataFrame:
    """Plain HyperLogLog++ estimate (no reusable binary) — cheaper when
    the rollup-merge property isn't needed."""
    agg = F.approx_count_distinct(value_col, rsd).alias("n_distinct_est")
    return df.groupBy(*key_cols).agg(agg) if key_cols else df.agg(agg)


__all__ = ["distinct_sketch", "rollup_sketches", "approx_distinct", "DEFAULT_LG_K"]
