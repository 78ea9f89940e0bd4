"""Exact frequent-item mining with a two-phase pruning bound.

The naive plan — ``groupBy(value).count().filter(cnt >= s)`` — shuffles
every distinct value, so at 100 TB the long tail (trillions of
singleton values) dominates the exchange even though none of it can
ever reach the support threshold.

The two-phase plan prunes the tail before it shuffles, and is still
EXACT (never approximate).  Support is the rational ``total_rows / k``
for an integer ``k``, so both phases compare with integer arithmetic
and agree exactly:

1. **Local phase** (Arrow-batched ``mapInPandas``, zero shuffle): each
   partition counts its own values and emits only candidates with
   ``local_cnt * k >= local_rows``.  By a weighted pigeonhole
   argument, any value with GLOBAL ``cnt * k >= total_rows`` must
   clear that bar in at least one partition — if ``cnt_i * k <
   rows_i`` for every i, summing gives ``cnt * k < total``.  So the
   candidate set has no false negatives; false positives are fine
   (removed next).
2. **Verify phase**: exact global count of the candidates only — the
   original stream is semi-joined against the (small, broadcastable)
   candidate set, then counted and filtered against the true global
   threshold.

Result is identical to the naive plan; only the shuffle volume
changes (distinct candidates instead of distinct values).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def local_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition candidate values (``local_cnt * k >=
    local_rows``), counted in one Arrow pass with no shuffle."""
    src = df.select(F.col(col).cast("string").alias("value"))

    def count_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        rows = 0
        for b in batches:
            rows += len(b)
            for v, c in b["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        keep = [v for v, c in counts.items() if c * k >= rows]
        yield pd.DataFrame({"value": pd.Series(keep, dtype="object")})

    return src.mapInPandas(count_partition, "value string")


def frequent_items(df: DataFrame, col: str, k: int) -> DataFrame:
    """All values of ``col`` with global count >= total_rows / k
    (i.e. ``cnt * k >= total``) — exact, via local-prune + verify
    (module docstring).  Returns (value, cnt)."""
    if k < 1:
        raise ValueError(f"k must be a positive integer: {k}")
    src = df.select(F.col(col).cast("string").alias("value"))
    cand = local_candidates(df, col, k).distinct()
    total = df.agg(F.count("*").alias("_total"))
    return (
        src.join(F.broadcast(cand), on="value", how="left_semi")
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(k) >= F.col("_total"))
        .drop("_total")
    )
