"""Incremental aggregate maintenance: combine partial aggregation
states instead of re-scanning history.

The 100 TB motivation: a daily rollup over an append-only fact table
should cost O(|delta|), not O(|history|).  Decomposable aggregates
(count, sum, min, max — and anything algebraic over them, e.g. mean =
merged_sum / merged_count) maintain exactly under partial-state
merge: aggregate each increment alone, then combine states with the
aggregate's own combiner (sum-of-counts, sum-of-sums, min-of-mins,
max-of-maxes).  The merged result is bit-identical to a full
recompute for integer/decimal states (associative + commutative);
the catalog query (q112) pins that equivalence against a
full-recompute oracle.

``partial_aggregate`` produces the state table for one increment;
``merge_partials`` combines any number of state tables.  Chain:
yesterday's state + today's delta state -> today's state, forever —
the raw history is never re-read.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# state combiner per decomposable aggregate
_COMBINE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_INIT = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def partial_aggregate(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one increment into a partial-state table.

    ``specs`` maps output column -> (agg, input column), agg in
    {count, sum, min, max}.  count state is stored as a long so it
    merges with ``sum``.
    """
    aggs = []
    for out, (agg, col) in specs.items():
        if agg not in _INIT:
            raise ValueError(f"non-decomposable aggregate: {agg}")
        expr = _INIT[agg](col)
        if agg == "count":
            expr = expr.cast("long")
        aggs.append(expr.alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    partials: list[DataFrame],
    keys: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Combine partial-state tables into one state table — one union +
    one keyed aggregation over STATES (not raw rows), so the cost is
    proportional to the number of distinct keys, not history size."""
    if not partials:
        raise ValueError("need at least one partial")
    unioned = reduce(DataFrame.unionByName, partials)
    aggs = [
        _COMBINE[agg](out).alias(out)
        for out, (agg, _col) in specs.items()
    ]
    return unioned.groupBy(*keys).agg(*aggs)
