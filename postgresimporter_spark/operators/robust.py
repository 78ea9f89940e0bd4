"""Robust aggregation: estimators that survive heavy tails and
adversarial rows at 100 TB without a second pass.

``median_of_means`` is the classic sub-Gaussian mean estimator
(Nemirovsky & Yudin 1983; Jerrum, Valiant & Vazirani 1986): split each
group's rows into B deterministic buckets, take the mean of each
bucket, report the MEDIAN of the bucket means. A single corrupted or
heavy-tailed row can move at most one bucket mean, so the median is
unmoved — unlike the plain mean — while the estimator stays one
shuffle + a B-row-per-group reduction (the exact-median-of-everything
alternative needs a full per-group sort).

Determinism contract (catalog invariant): bucket assignment is the
md5 bucket of the row id (engine-replayable, partitioning-independent),
all means are integer micro-units via exact integer division, and the
median of an even bucket count is the floor-average of the two central
values — every engine lands on the same integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash_bucket


def median_of_means(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    n_buckets: int = 16,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key robust mean: median of ``n_buckets`` deterministic
    bucket means, in exact integer ``scale``-units.

    Shape: one (key, bucket) aggregation with map-side partials, then
    a ``n_buckets``-rows-per-key rank + pick — the per-key state is
    O(B) whatever the group size, and the central-rank window is
    partitioned by key (never global). The plain mean rides along so
    the robustness delta is visible in the output.

    Returns key_cols + (n_rows, mean_scaled, mom_scaled) where values
    are ``value * scale`` as BIGINT (value quantized to cents first so
    both engines aggregate identical integers).
    """
    cents = F.expr(f"CAST({value_col} * 100 AS DECIMAL(20,0))").cast("long")
    rows = df.select(
        *key_cols,
        hash_bucket(F.col(id_col).cast("string"), n_buckets).alias("_b"),
        cents.alias("_cents"),
    )
    # checkpointed: the ranked central-pick AND the per-key stats both
    # read the O(keys x B) bucket table — without materialization each
    # consumer would re-run the full scan + aggregation
    per_bucket = rows.groupBy(*key_cols, "_b").agg(
        F.count("*").cast("long").alias("_cnt"),
        F.sum("_cents").cast("long").alias("_sum"),
    ).localCheckpoint(eager=False)
    # bucket mean in scale-units: cents * scale/100 div cnt (exact ints)
    bmean = per_bucket.withColumn(
        "_bmean", F.expr(f"(_sum * {scale // 100}) div _cnt").cast("long")
    )
    w = Window.partitionBy(*key_cols).orderBy(F.asc("_bmean"), F.asc("_b"))
    ranked = bmean.withColumn("_rk", F.row_number().over(w))
    stats = bmean.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("_nb"),
        F.sum("_cnt").cast("long").alias("n_rows"),
        F.sum("_sum").cast("long").alias("_tot_cents"),
    )
    # central rank(s): lo = (nb+1)//2, hi = nb//2 + 1; median = floor
    # average of the two (equal when nb is odd)
    central = (
        ranked.join(stats.select(*key_cols, "_nb"), on=key_cols)
        .where(
            (F.col("_rk") == F.expr("(_nb + 1) div 2"))
            | (F.col("_rk") == F.expr("_nb div 2 + 1"))
        )
        .groupBy(*key_cols)
        .agg(
            F.expr("CAST(sum(_bmean) div count(*) AS BIGINT)").alias(
                "mom_scaled"
            )
        )
    )
    return (
        stats.join(central, on=key_cols)
        .select(
            *key_cols,
            "n_rows",
            F.expr(f"(_tot_cents * {scale // 100}) div n_rows")
            .cast("long")
            .alias("mean_scaled"),
            "mom_scaled",
        )
    )


__all__ = ["median_of_means"]
