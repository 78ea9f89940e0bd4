"""Skew-aware split join: hot keys take a broadcast leg, cold keys a
shuffle leg, results union — the manual form of AQE's skew-join
optimization, for when a single join key carries a macroscopic
fraction of the fact table (the null-surrogate key, the "unknown"
user, the default partition) and one reducer would otherwise receive
that key's entire volume.

Net-new engine surface (the reference — ``/root/reference/
postgresimporter/main.py`` — delegates all query execution to
Postgres and ships no join strategies). Companion to the q157 skew
planner: the planner measures per-key skew; this operator acts on it.

Design rules, carried from the rest of the engine:

- **No eager driver work.** Hot keys are detected with the same
  plan-level pattern as ``dedup._band_freqs``: a per-key frequency
  aggregate joined against a broadcast 1-row total — never a
  ``collect()`` of frequencies, never a hard-coded key list.
- **Bounded by construction.** A key is hot when its left-side
  frequency exceeds ``max_key_ratio`` of all left rows, so there can
  be at most ``1/max_key_ratio`` hot keys — the hot-key set and the
  right side's rows for those keys are broadcastable regardless of
  input size. Contract: the RIGHT side must be key-unique or
  near-unique (a dim or pre-aggregated table), so "right rows for
  <= 1/ratio keys" stays executor-memory sized at any scale.
- **Exact.** Every left row goes to exactly one leg (semi vs anti on
  the hot-key set); the union is the plain inner-join result,
  row-for-row — verified against a plain-SQL oracle (q302).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_key_ratio: float = 0.01,
) -> DataFrame:
    """Inner-join ``left`` with ``right`` on column ``on``, routing
    keys whose left-side frequency exceeds ``max_key_ratio`` of all
    left rows through a broadcast-hash leg (no shuffle of the hot
    rows) and the rest through the ordinary shuffle join. Returns the
    exact inner-join result (column order: left columns then right's
    non-key columns, as with a plain ``join``)."""
    total = left.agg(F.count("*").cast("double").alias("_n_left"))
    hot = (
        left.groupBy(on)
        .agg(F.count("*").cast("double").alias("_freq"))
        .join(F.broadcast(total))
        .where(F.col("_freq") > F.lit(max_key_ratio) * F.col("_n_left"))
        .select(on)
        # Shared by three broadcast legs below: without the checkpoint
        # Catalyst re-evaluates the full left-side frequency aggregate
        # once per use (3x the left scan+shuffle).
        .localCheckpoint(eager=False)
    )
    left_hot = left.join(F.broadcast(hot), on, "left_semi")
    left_cold = left.join(F.broadcast(hot), on, "left_anti")
    right_hot = right.join(F.broadcast(hot), on, "left_semi")
    return left_cold.join(right, on).unionByName(
        left_hot.join(F.broadcast(right_hot), on)
    )


def hot_join_keys(
    left: DataFrame, on: str, max_key_ratio: float = 0.01
) -> DataFrame:
    """The keys ``skew_split_join`` with the same ratio routes through
    the broadcast leg, as (key, n_rows) — the audit/report companion
    (``hot_shingles``/``hot_bands``/``hot_degrees`` pattern); here
    nothing is dropped, but the routing decision is observable."""
    total = left.agg(F.count("*").cast("double").alias("_n_left"))
    return (
        left.groupBy(on)
        .agg(F.count("*").cast("double").alias("_freq"))
        .join(F.broadcast(total))
        .where(F.col("_freq") > F.lit(max_key_ratio) * F.col("_n_left"))
        .select(on, F.col("_freq").cast("long").alias("n_rows"))
    )


__all__ = ["skew_split_join", "hot_join_keys"]
