"""Event-time operators over the ``events`` table: tumbling windows,
sessionization, JSON property extraction.

Batch implementations here; ``streaming/`` applies the same logic under
Structured Streaming with watermarks.

Sessionization is deliberately the gaps-and-islands formulation (lag +
cumulative flag sum per user) rather than ``F.session_window`` — the two
are semantically identical for batch, but gaps-and-islands is exactly
expressible in ANSI SQL, which keeps the operator oracle-checkable. One
shuffle on user_id; the two windows share the same partitioning, so
Catalyst plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time aggregation. Partial aggregation is
    map-side (Catalyst); one shuffle on (hour, event_type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal accumulation -> double: independent of
            # partitioning/addition order (hash-stable vs the oracle)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    bucket_hours: int | None = None,
) -> DataFrame:
    """Assign session ids per user: a session breaks when the gap from
    the previous event exceeds ``gap_minutes``.

    Default path: one window partitioned by user — a single shuffle,
    correct and cheapest when per-user event counts are moderate. Its
    100 TB failure mode is the HOT USER (bot/scraper traffic): the
    per-user window puts every event of a user into one task, so a
    billion-event user serializes — measured locally, a 20M-event user
    pinned the whole job on its one straggler task (75s warm with 31
    idle cores).

    ``bucket_hours`` switches to the two-phase time-sliced
    formulation, identical output by construction (unit-tested
    row-for-row against the plain path): events window within
    (user, time-bucket) — bounded, parallel — and bucket summaries
    (first/last timestamp, internal break count) resolve the
    cross-boundary breaks per user over BUCKET rows, metadata scale
    (a 20M-event month at 6h buckets is ~120 summary rows). The
    session id is the user's exclusive running break total over prior
    buckets plus the within-bucket running break count. Gaps never
    straddle more than one boundary resolution because the previous
    event of a bucket's first event IS the previous non-empty
    bucket's last event (buckets partition time; floor(ts/bucket) is
    monotone, and tied timestamps share a bucket so the event_id
    tiebreak never crosses buckets). Cost: two extra bounded shuffles
    (summary aggregate + the summary join, co-partitioned with the
    event windows). Pick ``bucket_hours`` a few times the expected
    session length; correctness does not depend on the choice. Null
    ``user_id`` rows sessionize identically to the plain path (the
    summary join is null-safe); null ``ts`` rows RAISE — the plain
    path's NULLS FIRST ordering has no well-defined boundary-gap
    counterpart, and a silent drop would be worse."""
    gap_us = gap_minutes * 60 * 1_000_000
    if bucket_hours is None:
        by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev_ts = F.lag("ts").over(by_user)
        # microsecond epoch diff: exact integer arithmetic, no seconds
        # truncation ambiguity (oracle uses epoch_us identically)
        new_session = F.when(
            prev_ts.isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > gap_us),
            1,
        ).otherwise(0)
        return events.withColumn(
            "session_id",
            F.sum(new_session).over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    if bucket_hours < 1:
        raise ValueError(
            f"bucket_hours must be >= 1, got {bucket_hours} (0 would "
            "null every bucket via division, negative would reverse "
            "the boundary-resolution order)"
        )
    cols = events.columns
    # every internal name the branch generates (ADVICE r10): the
    # summary-side aliases too, so a column named _bflag raises here
    # instead of as an ambiguous-column error deep in the plan
    clash = {
        "_ts_us", "_bkt", "_iflag", "session_id",
        "_first_us", "_last_us", "_ibreaks",
        "_bflag", "_base", "_s_uid", "_s_bkt", "_uc", "_unull",
        "_s_unull",
    }.intersection(cols)
    if clash:
        raise ValueError(
            f"bucketed sessionize: input columns collide with internal "
            f"names: {sorted(clash)}"
        )
    bucket_us = bucket_hours * 3600 * 1_000_000
    # null timestamps are rejected loudly: the plain path gives them a
    # defined (if degenerate) NULLS FIRST ordering, but the bucketed
    # decomposition's boundary-gap arithmetic is undefined on them —
    # a silent drop or a divergent session id would both be worse
    ts_us = F.when(
        F.col("ts").isNotNull(), F.unix_micros(F.col("ts"))
    ).otherwise(
        F.raise_error(
            F.lit("sessionize(bucket_hours=...): null ts; filter or "
                  "impute timestamps before bucketed sessionization")
        )
    )
    ev = events.withColumn("_ts_us", ts_us).withColumn(
        "_bkt", F.floor(F.col("_ts_us") / F.lit(bucket_us))
    )
    # Null-safe join key WITHOUT eqNullSafe (r13): `user_id <=> _s_uid`
    # rewrites the join keys to (coalesce(u,''), isnull(u)) — derived
    # EXPRESSIONS no upstream HashPartitioning(user_id, _bkt)
    # satisfies — so the planner re-exchanged BOTH full event branches
    # for the summary join and then AGAIN for the final window
    # (measured: three full-data Exchanges of the event table instead
    # of one, ~2× the shuffled bytes of the whole job). Materializing
    # that exact rewrite as COLUMNS (`_uc` = null-coalesced user,
    # `_unull` = the null flag) lets every phase — event window,
    # summary aggregate, summary join, final window — key on the same
    # plain attributes and share ONE exchange of the events
    # (guide §2.4), with native codegen sorts (a struct-wrapped key
    # also dedups the exchanges but its interpreted ordering made the
    # sorts 2× slower than the exchanges it saved). Grouping is
    # unchanged: (_uc, _unull) determines user_id exactly — for
    # non-null users _uc IS user_id and _unull=false, and a sentinel
    # collision with a real user value still differs on _unull.
    ut = events.schema["user_id"].dataType
    if isinstance(ut, T.StringType):
        _sent = F.lit("")
    elif isinstance(ut, T.NumericType):
        _sent = F.lit(0).cast(ut)
    else:
        # exotic key type: no same-type literal to coalesce with; a
        # single-field struct compares its null field as equal under
        # plain `=`, keeping the shared-exchange plan shape at the
        # cost of interpreted struct ordering in the sorts
        _sent = None
    if _sent is None:
        ev = ev.withColumn("_uc", F.struct("user_id")).withColumn(
            "_unull", F.lit(False)
        )
    else:
        ev = ev.withColumn(
            "_uc", F.coalesce(F.col("user_id"), _sent)
        ).withColumn("_unull", F.col("user_id").isNull())
    wb = Window.partitionBy("_uc", "_unull", "_bkt").orderBy(
        "ts", "event_id"
    )
    prev_us = F.lag("_ts_us").over(wb)
    # null marks the bucket's first event: its break flag is resolved
    # at the boundary phase, not here.
    # Both the summary aggregate and the final join read this branch.
    # No checkpoint here (r13): a localCheckpoint would erase the hash
    # partitioning, forcing the summary join AND the final
    # per-(user, bucket) window to re-shuffle the full event table
    # (guide §2.4: operations keyed the same way should share one
    # exchange — the join-left window, the summary join, and the final
    # window all ride the `_uc, _unull, _bkt` exchange below). The
    # window's total order (ts, event_id) makes the twice-evaluated
    # _iflag deterministic, so the two readers can never diverge.
    ev = ev.withColumn(
        "_iflag",
        F.when(prev_us.isNull(), F.lit(None).cast("int")).otherwise(
            (F.col("_ts_us") - prev_us > gap_us).cast("int")
        ),
    )
    # The summary branch re-evaluates the (column-pruned) event scan
    # through its own exchange: unifying it with the join-left
    # exchange would need byte-identical subtrees (exchange reuse
    # dedups only canonically equal plans; pruning and the inferred
    # join-key null filter make them differ), and the cache/checkpoint
    # alternatives either leak memory past the operator or erase the
    # hash partitioning. Two full-data exchanges total — down from
    # four before the materialized key columns (r13).
    summ = ev.groupBy("_uc", "_unull", "_bkt").agg(
        F.min("_ts_us").alias("_first_us"),
        F.max("_ts_us").alias("_last_us"),
        F.coalesce(F.sum("_iflag"), F.lit(0)).alias("_ibreaks"),
    )
    wu = Window.partitionBy("_uc", "_unull").orderBy("_bkt")
    prev_last = F.lag("_last_us").over(wu)
    bflag = F.when(
        prev_last.isNull() | (F.col("_first_us") - prev_last > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    started = F.col("_ibreaks") + bflag
    base = (
        F.sum(started).over(wu.rowsBetween(Window.unboundedPreceding, 0))
        - started
    )
    summ = summ.select(
        F.col("_uc").alias("_s_uid"),
        F.col("_unull").alias("_s_unull"),
        F.col("_bkt").alias("_s_bkt"),
        bflag.cast("int").alias("_bflag"),
        base.cast("long").alias("_base"),
    )
    # null-safe on the user key: a null user_id is a real window
    # partition in the plain path (and a real group here); the
    # materialized (_uc, _unull) pair makes plain `=` keep those rows
    # (see the key-column note above)
    joined = ev.join(
        summ,
        (F.col("_uc") == F.col("_s_uid"))
        & (F.col("_unull") == F.col("_s_unull"))
        & (F.col("_bkt") == F.col("_s_bkt")),
    ).drop("_s_uid", "_s_unull", "_s_bkt")
    resolved = F.coalesce(F.col("_iflag"), F.col("_bflag"))
    session_id = F.col("_base") + F.sum(resolved).over(
        wb.rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.withColumn("session_id", session_id).select(
        *cols, "session_id"
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    bucket_hours: int | None = None,
) -> DataFrame:
    """Per-session aggregates (start/end/n_events/total value)."""
    s = sessionize(events, gap_minutes, bucket_hours=bucket_hours)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


def extract_props(events: DataFrame, key: str = "k") -> DataFrame:
    """Pull a typed value out of the JSON ``props`` column."""
    return events.withColumn(
        f"prop_{key}",
        F.get_json_object(F.col("props"), f"$.{key}").cast("int"),
    )


__all__ = ["hourly_rollup", "sessionize", "session_stats", "extract_props"]
