"""Data-layout operators: Z-order (Morton) clustering keys.

Why this matters at 100 TB: min/max file statistics only skip files
when the data is clustered on the filter column. Sorting clusters ONE
column; interleaving the bits of several columns (Z-ordering) gives
every interleaved column partial clustering, so multi-dimensional
point/range filters each prune most files. The write path is
``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — one range
shuffle at write time, amortized over every subsequent scan (same
trade as bucketing, but for *filters* rather than joins).

The bit-interleave is built from pure integer arithmetic
(``(x div 2^i) % 2``) instead of engine bit operators, so the DuckDB
oracle replays it verbatim — and it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative ints, ``bits``
    low bits each (values are masked to ``2^bits`` first). Bit ``i`` of
    column ``j`` lands at output bit ``i * n_cols + j``."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if bits * n > 62:
        raise ValueError("interleaved width must fit a signed 64-bit long")
    total = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        masked = c.cast("long") % (1 << bits)
        for i in range(bits):
            # JVM-side shift/mask (cheapest per row); the SQL oracle
            # uses the arithmetically-identical div/mod form
            bit = F.shiftright(masked, i).bitwiseAND(F.lit(1))
            total = total + bit * F.lit(1 << (i * n + j)).cast("long")
    return total


def zorder_key_sql(col_names: list[str], bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (DuckDB oracle)."""
    n = len(col_names)
    terms = []
    for j, name in enumerate(col_names):
        masked = f"(CAST({name} AS BIGINT) % {1 << bits})"
        for i in range(bits):
            terms.append(
                f"(({masked} // {1 << i}) % 2) * {1 << (i * n + j)}"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "_z",
) -> DataFrame:
    """Cluster rows by Z-value: range-partition on the interleaved key,
    sort within partitions. Writing this DataFrame yields files whose
    per-column min/max ranges are tight on EVERY interleaved column —
    the layout data-skipping needs."""
    keyed = df.withColumn(z_col, zorder_key([F.col(c) for c in cols], bits))
    parted = (
        keyed.repartitionByRange(num_partitions, z_col)
        if num_partitions
        else keyed.repartitionByRange(z_col)
    )
    return parted.sortWithinPartitions(z_col).drop(z_col)


__all__ = ["zorder_key", "zorder_key_sql", "zorder_layout"]
