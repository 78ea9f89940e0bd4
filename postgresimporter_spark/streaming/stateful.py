"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats``: per-user running aggregates (event count, value
sum, last-seen) maintained across micro-batches with optional idle-state
eviction — the shape of any custom online aggregate that
``groupBy().agg()`` can't express incrementally (decayed counters,
online quantile sketches, per-entity anomaly state...).

Scale posture: state is per-key (user_id) and O(1) per key; keys are
distributed across executors by the groupBy hash; idle keys are evicted
by the processing-time timeout rather than growing forever.

Hot-key posture (r11 probe, measured on the q326-style bot corpus —
one user owning 4M of 4.4M rows): state stays O(1) regardless of key
skew (three scalars; 10,001 state rows for 10,001 keys) and the drain
completes correctly — the hot key costs THROUGHPUT, not memory: all
of its rows in each micro-batch serialize through one Python worker's
Arrow channel (16.2s vs 5.3s for the 400k-row spread tail, ~linear in
rows). At a 100 TB stream where one key carries most of the tape,
that single-worker ceiling is the bound to engineer around: shard the
key upstream (e.g. ``user_id, pmod(hash(event_id), N)``) and merge
the N sub-states downstream — the merge is trivial for commutative
stats like these; Spark cannot chain a pre-aggregation into the same
stateful query (two stateful operators in update mode).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"

IDLE_TIMEOUT_MS = 60 * 60 * 1000  # 1h idle-state eviction


def _make_update_fn(idle_eviction: bool):
    """Closure factory: the flag must travel WITH the function — a
    module-level global would pickle by reference and reset to its
    import-time value on the Python workers."""

    def _update_user_stats(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle key: emit nothing, drop the state (bounded memory)
            state.remove()
            return
        if state.exists:
            n_events, total_value, last_ts = state.get
        else:
            n_events, total_value, last_ts = 0, 0.0, None

        for pdf in batches:
            n_events += len(pdf)
            # fixed-point accumulation (micro-units) keeps the running
            # sum independent of batch/row order (pandas_ops rule)
            total_value += (
                (pdf["value"] * 1_000_000).round().astype("int64").sum()
                / 1_000_000
            )
            batch_max = pdf["ts"].max()
            if last_ts is None or batch_max > last_ts:
                last_ts = batch_max

        state.update((n_events, total_value, last_ts))
        if idle_eviction:
            state.setTimeoutDuration(IDLE_TIMEOUT_MS)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "total_value": [total_value],
                "last_ts": [last_ts],
            }
        )

    return _update_user_stats


def running_user_stats(
    events: DataFrame, idle_eviction: bool = False
) -> DataFrame:
    """Streaming per-user running stats.

    ``idle_eviction=True`` enables the 1h processing-time timeout that
    drops idle keys (the bounded-state posture for continuous
    deployments). It must stay OFF for drain-and-stop runs
    (``trigger(availableNow=True)``): a pending timeout makes Spark keep
    scheduling empty micro-batches to fire it, so the query never
    terminates.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_eviction),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_eviction
            else GroupStateTimeout.NoTimeout
        ),
    )


__all__ = ["running_user_stats"]
