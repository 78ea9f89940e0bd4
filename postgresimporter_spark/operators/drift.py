"""Distribution-drift monitoring between dataset snapshots.

A long-running ingest (or a model's serving traffic) needs an answer to
"did this feature's distribution move?" — the standard production
monitor is the Population Stability Index over a fixed binning:

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

with Laplace-smoothed bin shares so empty bins never produce log(0).
Rule-of-thumb thresholds: < 0.1 stable, 0.1–0.25 drifting, > 0.25
shifted.

Scale shape: ONE pass over each snapshot — bin assignment is a pure
projection (floor-divide, capped), and both snapshots aggregate with
conditional sums in a single groupBy(bin) (map-side partials, ≤ bins
rows out).  All arithmetic is integer until the final share division
and one ln per bin, both mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fixed_width_bin(
    col: Column, width: float, n_bins: int
) -> Column:
    """Bin index: floor(col / width), capped to [0, n_bins-1].
    Fixed binning (not quantiles) so two snapshots bin identically
    regardless of their own distributions."""
    raw = F.floor(col / F.lit(width)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def psi_report(
    df: DataFrame,
    value_col: str,
    is_baseline: Column,
    width: float,
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bin PSI contributions between the ``is_baseline`` rows and
    the rest.  Returns (bin, n_base, n_curr, psi_term) — the total PSI
    is the sum of psi_term; per-bin terms localize WHICH range moved.

    Laplace smoothing: shares use (count+1) / (N + n_bins), so both
    sides are strictly positive.  One ln per bin, one division per
    share — deterministic, engine-portable at ``round_digits``.
    """
    binned = df.select(
        fixed_width_bin(F.col(value_col), width, n_bins).alias("bin"),
        # NULL predicate counts as current, not skipped (sum() would
        # silently drop NULLs and desync n_base + n_curr from N)
        F.coalesce(is_baseline.cast("int"), F.lit(0)).alias("_b"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("_b").cast("long").alias("n_base"),
        F.sum(1 - F.col("_b")).cast("long").alias("n_curr"),
    )
    totals = counts.agg(
        F.sum("n_base").alias("_nb"), F.sum("n_curr").alias("_nc")
    )
    p = ((F.col("n_base") + 1).cast("double")) / (
        (F.col("_nb") + n_bins).cast("double")
    )
    q = ((F.col("n_curr") + 1).cast("double")) / (
        (F.col("_nc") + n_bins).cast("double")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_base",
            "n_curr",
            F.round((p - q) * (F.log(p) - F.log(q)), round_digits).alias(
                "psi_term"
            ),
        )
        .orderBy("bin")
    )


__all__ = ["fixed_width_bin", "psi_report"]
