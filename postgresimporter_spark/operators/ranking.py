"""Distributed global ranking — total-order row numbers without a
single-reducer window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row through
ONE partition (Spark warns "No Partition Defined for Window operation").
Fine at sf0.1; a scale-killer at 100 TB. The classic distributed
alternative (same idea as RDD ``zipWithIndex``, re-expressed in the
DataFrame API so Catalyst keeps optimizing around it):

1. ``repartitionByRange`` on the order columns — partition *id* order
   now equals sort order, and the sort work is spread over all
   executors (Spark samples range boundaries; skew spreads out).
2. rank *locally* inside each partition (window partitioned by the
   range-partition id — a balanced shuffle, never one reducer).
3. add the total row count of all earlier partitions, computed from a
   tiny per-partition count table (|partitions| rows) joined back via
   broadcast.

The per-partition count table is derived from the ranged data, so the
ranged branch is ``localCheckpoint``-ed first: range boundaries are
*sampled* and a recompute could repartition differently between the two
branches (BUILD_NOTES invariant 6/7 territory — same reason the MinHash
signatures materialize).

``exact_ntile`` reproduces SQL ``NTILE(k)`` bucket-size semantics
(first ``n mod k`` buckets get ``ceil(n/k)`` rows) from the global row
number with pure arithmetic — bit-for-bit what a global-window NTILE
returns, including tie splits at bucket boundaries, without the global
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# monotonically_increasing_id packs (partition_id << 33 | row_index):
# a range partition holding more than 2^33 rows would silently bleed
# its local index into the partition-id bits and corrupt ranks. Far
# beyond any sane partition (~8.6B rows), but guarded LOUDLY (r14,
# VERDICT r13 #5): the per-partition count table — computed anyway —
# asserts every count fits. Module-level so tests can shrink the cap
# to exercise the failure path without 2^33 rows.
_LOCAL_INDEX_CAP = 1 << 33


def _checked_count(cnt):
    """``cnt`` verified against the 33-bit local-index cap: the value
    IS the guard — a CASE whose overflow branch is ``raise_error``
    (raises executor-side on violation). The branches differ, so
    Catalyst cannot simplify the conditional away; the original
    ``when(ok.isNull(), cnt).otherwise(cnt)`` assert_true wrapper had
    identical branches and SimplifyConditionals pruned the assert
    silently (caught by the cap unit test)."""
    return F.when(cnt <= F.lit(_LOCAL_INDEX_CAP), cnt).otherwise(
        F.raise_error(
            F.concat(
                F.lit("global_row_number: a range partition holds "),
                cnt.cast("string"),
                F.lit(
                    f" rows, over the {_LOCAL_INDEX_CAP}-row "
                    "monotonically_increasing_id local-index cap; "
                    "pass a larger num_partitions"
                ),
            )
        ).cast("long")
    )


def _num_partitions(df: DataFrame, requested: int | None) -> int:
    if requested:
        return requested
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return 200


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    idx_col: str = "row_idx",
    total_col: str = "n_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global row number over a TOTAL order (callers
    must pass a tie-broken ordering) plus the total row count, with no
    unpartitioned window anywhere in the plan.

    Local ranks come from ``monotonically_increasing_id()`` evaluated
    over the range-partitioned, partition-sorted data (r13): the id is
    ``partition_id << 33 | row_index``, so ``_pid`` and a 1-based
    ``_local_rn`` are two bit-ops per row — where the previous layout
    paid a ``Window.partitionBy(_pid)`` whose required distribution
    re-shuffled the ENTIRE checkpointed table by ``_pid`` (the
    checkpoint erases the partitioning info, so the exchange was a
    pure tax: one extra full-data network pass per call, measured in
    the quantile_hot guard which calls this twice). The sort moves
    from the window into ``sortWithinPartitions`` — same one sort,
    one less full-data exchange. The eager ``localCheckpoint`` still
    pins the (sampled) range partitioning AND the in-partition order
    before both consumers read it, exactly as before; the 33-bit
    local index caps partitions at 2^33 rows — far beyond any sane
    partition, and guarded LOUDLY (r14): the per-partition count
    table asserts every count fits and a violation raises instead of
    silently wrapping ranks. Internal columns are dropped; the result
    keeps the input columns + ``idx_col`` + ``total_col``.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_part = _num_partitions(df, num_partitions)

    ranged = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    local = ranged.withColumn(
        "_pid", F.shiftright(F.col("_mid"), 33).cast("int")
    ).withColumn(
        "_local_rn",
        F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1,
    )

    counts = local.groupBy("_pid").agg(
        _checked_count(F.count("*")).alias("_cnt")
    )
    a, b = counts.alias("a"), counts.alias("b")
    # offset(p) = rows in all partitions before p; theta-join over the
    # tiny count table (|partitions| rows) instead of an unpartitioned
    # running-sum window, so the whole plan is window-partitioned.
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    total = counts.agg(F.sum("_cnt").cast("long").alias(total_col))
    keyed = offsets.crossJoin(F.broadcast(total))

    return (
        local.join(F.broadcast(keyed), "_pid")
        .withColumn(idx_col, (F.col("_off") + F.col("_local_rn")).cast("long"))
        .drop("_mid", "_pid", "_local_rn", "_off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    idx_col: str = "row_idx",
    rsum_col: str = "running_sum",
    total_col: str = "v_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global row number AND the running sum of
    ``value_col`` over a TOTAL order (tie-broken by the caller), plus the
    grand total — with no unpartitioned window anywhere in the plan.

    Same layout as ``global_row_number``: range-partition on the order
    columns, rank + prefix-sum *locally* per partition, then add the
    (count, value-sum) of all earlier partitions from a tiny
    |partitions|-row offset table joined back via broadcast. This is the
    distributed form of ``SUM(x) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` — the cumulative-coverage / CDF primitive.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_part = _num_partitions(df, num_partitions)

    ranged = (
        df.repartitionByRange(n_part, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn(
        "_local_rn", F.row_number().over(w)
    ).withColumn(
        "_local_sum",
        F.sum(value_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    counts = ranged.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.sum(value_col).alias("_vsum")
    )
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"),
            F.coalesce(F.sum("b._vsum"), F.lit(0)).alias("_voff"),
        )
    )
    total = counts.agg(F.sum("_vsum").alias(total_col))
    keyed = offsets.crossJoin(F.broadcast(total))

    return (
        local.join(F.broadcast(keyed), "_pid")
        .withColumn(idx_col, (F.col("_off") + F.col("_local_rn")).cast("long"))
        .withColumn(rsum_col, F.col("_voff") + F.col("_local_sum"))
        .drop("_pid", "_local_rn", "_local_sum", "_off", "_voff")
    )


def global_running_max(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    idx_col: str = "row_idx",
    rmax_col: str = "running_max",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Append a 1-based global row number AND the running MAX of
    ``value_col`` over a TOTAL order — the sweep-line primitive
    (skyline/Pareto, envelope curves) — with no unpartitioned window.

    Same layout as ``global_running_sum``: range-partition on the
    order columns, local cumulative max per partition, then combine
    with the max of all EARLIER partitions from the broadcast offset
    table (max is associative, so prefix-max decomposes exactly like
    prefix-sum). ``inclusive=False`` gives the max over STRICTLY
    earlier rows (NULL for the global first row) — the strict-
    dominance form a skyline sweep needs; ``greatest`` skips the NULL
    partial on partition boundaries either way.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_part = _num_partitions(df, num_partitions)

    ranged = (
        df.repartitionByRange(n_part, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn(
        "_local_rn", F.row_number().over(w)
    ).withColumn(
        "_local_max",
        F.max(value_col).over(
            w.rowsBetween(
                Window.unboundedPreceding,
                Window.currentRow if inclusive else -1,
            )
        ),
    )

    stats = ranged.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.max(value_col).alias("_vmax")
    )
    a, b = stats.alias("a"), stats.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"),
            F.max("b._vmax").alias("_vprev"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(idx_col, (F.col("_off") + F.col("_local_rn")).cast("long"))
        .withColumn(rmax_col, F.greatest("_local_max", "_vprev"))
        .drop("_pid", "_local_rn", "_local_max", "_off", "_vprev")
    )


def exact_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    k: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``NTILE(k)`` over a total order, distributed.

    NTILE semantics: ``base = n div k``, the first ``r = n mod k``
    buckets hold ``base+1`` rows, the rest ``base``. For global 1-based
    index ``i``::

        i <= r*(base+1)  ->  ceil(i / (base+1))
        otherwise        ->  r + ceil((i - r*(base+1)) / base)

    (``n < k`` degenerates to bucket ``i`` via the first branch.)
    """
    ranked = global_row_number(
        df, order_cols, idx_col="_gidx", total_col="_n",
        num_partitions=num_partitions,
    )
    i, n = F.col("_gidx"), F.col("_n")
    base = F.floor(n / k).cast("long")
    r = (n % k).cast("long")
    first = r * (base + 1)
    # base >= 1 whenever the second branch is reachable; greatest() only
    # guards ANSI division against a hypothetical eager evaluation.
    safe_base = F.greatest(base, F.lit(1))
    bucket = F.when(
        i <= first, F.floor((i - 1) / (base + 1)) + 1
    ).otherwise(r + F.floor((i - first - 1) / safe_base) + 1)
    return ranked.withColumn(bucket_col, bucket.cast("long")).drop(
        "_gidx", "_n"
    )


def topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_buckets: int | None = None,
    salt_on: list[str] | None = None,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-``k`` rows per key under a deterministic total order.

    Plain mode (``salt_buckets=None``): one window partitioned by the
    key — right whenever no single key dominates a task.

    Salted mode: the scale answer for HOT keys (a crawler-trap domain
    with 10M rows would otherwise sort in one task, and AQE's skew
    splitter does not apply to windows).  Phase 1 ranks within
    (key, salt) so the hot key's sort spreads across ``salt_buckets``
    tasks and survives at most ``salt_buckets * k`` rows; phase 2
    re-ranks that bounded set per key.  The result is IDENTICAL for any
    row-to-bucket assignment — the global top-k is contained in the
    union of per-bucket top-k — so the salt just needs spread, not
    determinism (we hash the order columns for stability anyway).

    ``order_cols`` must define a total order (tie-break to a unique
    column) or "top k" itself is ambiguous.  ``salt_on`` names the
    plain columns hashed into the salt (order_cols may be sort
    expressions, which can't be hashed) — pass a high-cardinality
    column for a deterministic salt.  Without it, the salt is a
    round-robin over physical position (partition id + per-partition
    counter): full-duplicate rows of a hot key still SPREAD — hashing
    columns would send identical rows to one bucket and silently void
    the guard.  Positional salt is non-deterministic across runs,
    which is fine: any row-to-bucket assignment yields the same top-k.
    """
    order = list(order_cols)
    final_w = Window.partitionBy(*key_cols).orderBy(*order)
    if salt_buckets is None:
        return df.withColumn(
            rank_col, F.row_number().over(final_w)
        ).where(F.col(rank_col) <= k)
    if salt_on:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_on]),
            F.lit(salt_buckets),
        )
    else:
        salt = F.pmod(
            F.monotonically_increasing_id(), F.lit(salt_buckets)
        )
    phase1_w = Window.partitionBy(*key_cols, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(phase1_w))
        .where(F.col("_rk1") <= k)
        .drop("_salt", "_rk1")
    )
    return survivors.withColumn(
        rank_col, F.row_number().over(final_w)
    ).where(F.col(rank_col) <= k)


__all__ = [
    "global_row_number",
    "global_running_sum",
    "exact_ntile",
    "topk_per_key",
]
