"""Skew-handling aggregation: salted two-phase groupBy.

AQE's skew-join splitting covers joins, but a heavily-skewed *aggregation*
key (one event_type holding 50% of 100 TB) still funnels one reducer.
Salting splits each hot key across ``n_salts`` partial groups, then a
second (tiny) aggregation merges the partials. Results are identical to a
plain groupBy — pinned by the oracle-checked query and unit tests.

Only algebraic aggregates (sum/count/min/max) can ride this path;
count_distinct needs the two-level exact-distinct expansion instead
(groupBy(key, value) -> groupBy(key)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (key, salt) and computes
    partials; phase 2 merges partials per key.

    ``aggs`` maps output name -> (merge_fn_name, partial_expression);
    merge_fn_name in {'sum', 'min', 'max'} (count merges via sum).
    ``salt_source``: a column whose deterministic hash spreads rows
    (defaults to a row-local spread via monotonically_increasing_id —
    deterministic per partition layout; pass a real column for
    reproducibility across layouts).
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()])
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*key_cols).agg(
        *[
            merge[fn](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


__all__ = ["salted_agg"]
