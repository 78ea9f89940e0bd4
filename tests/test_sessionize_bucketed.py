"""Two-phase (time-bucketed) sessionization must equal the plain
per-user-window path ROW FOR ROW — the r10 hot-user scale fix
(a 20M-event bot user pinned the plain path on one straggler task;
bucketed ran 5.2x faster with identical sessions at the probe scale).

The fixture stresses every boundary the decomposition introduces:
gaps exactly equal to the threshold (NOT a break — strict >), events
exactly on bucket boundaries, tied timestamps (event_id tiebreak,
always inside one bucket), a hot user owning most rows, sessions
spanning several empty buckets, and single-event users.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from postgresimporter_spark.operators.sessionize import (
    session_stats,
    sessionize,
)

GAP_MIN = 30
BASE = datetime(2024, 3, 1, 0, 0, 0)


def _corpus() -> list[tuple]:
    rnd = random.Random(99)
    rows = []
    eid = 0

    def emit(user, ts):
        nonlocal eid
        rows.append((user, ts, eid, float(eid % 7)))
        eid += 1

    # hot user: 3000 events, gaps drawn to straddle the 30-min
    # threshold (including exact 30:00 gaps) and 6h bucket boundaries
    t = BASE
    for _ in range(3000):
        emit("bot", t)
        r = rnd.random()
        if r < 0.30:
            t = t + timedelta(minutes=30)  # exactly the gap: no break
        elif r < 0.45:
            t = t + timedelta(minutes=30, microseconds=1)  # break
        elif r < 0.55:
            t = t  # tied timestamp (event_id tiebreak)
        elif r < 0.65:
            t = t + timedelta(hours=rnd.choice([6, 12, 18]))  # on-boundary
        elif r < 0.75:
            t = t + timedelta(hours=rnd.uniform(7, 40))  # empty buckets
        else:
            t = t + timedelta(seconds=rnd.uniform(1, 1200))
    # spread users, incl. single-event users
    for u in range(40):
        t = BASE + timedelta(minutes=rnd.uniform(0, 10000))
        for _ in range(rnd.randint(1, 25)):
            emit(f"u{u}", t)
            t = t + timedelta(minutes=rnd.uniform(0.1, 90))
    return rows


SCHEMA = "user_id string, ts timestamp, event_id long, value double"


def test_bucketed_equals_plain_rowwise(spark):
    ev = spark.createDataFrame(_corpus(), SCHEMA)
    plain = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(ev, GAP_MIN).collect()
    }
    for bh in (1, 6, 48):
        bucketed = {
            (r.user_id, r.event_id): r.session_id
            for r in sessionize(ev, GAP_MIN, bucket_hours=bh).collect()
        }
        assert bucketed == plain, f"bucket_hours={bh}"
    assert len(plain) == len(_corpus())
    assert max(v for (u, _), v in plain.items() if u == "bot") > 100


def test_bucketed_stats_equal_plain(spark):
    ev = spark.createDataFrame(_corpus(), SCHEMA)
    key = ["user_id", "session_id"]
    plain = (
        session_stats(ev, GAP_MIN).orderBy(*key).toPandas()
    )
    bucketed = (
        session_stats(ev, GAP_MIN, bucket_hours=6).orderBy(*key).toPandas()
    )
    assert plain.equals(bucketed)


def test_bucketed_output_schema_matches_plain(spark):
    ev = spark.createDataFrame(_corpus()[:50], SCHEMA)
    a = sessionize(ev, GAP_MIN)
    b = sessionize(ev, GAP_MIN, bucket_hours=6)
    assert a.columns == b.columns
    assert a.schema == b.schema


def test_bucketed_plan_has_no_per_user_event_window(spark):
    """The event-level windows must partition by (user key, bucket) —
    the whole point; only the bucket-SUMMARY window (metadata scale)
    may partition by the user key alone. The plain path keeps the
    per-user event window. The user key is the materialized null-safe
    pair (_uc, _unull) since r13 (shared-exchange join keys)."""
    ev = spark.createDataFrame(_corpus()[:200], SCHEMA)
    plan = sessionize(ev, GAP_MIN, bucket_hours=6)._jdf.queryExecution(
    ).executedPlan().toString()
    # event-level windows are exactly the ones ORDERING by event_id;
    # each of their partition specs must include the bucket column
    event_windows = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln and "event_id" in ln
    ]
    assert event_windows, "expected event-level window nodes"
    for ln in event_windows:
        spec = ln.split("windowspecdefinition(")[1]
        assert spec.startswith("_uc") and "_bkt" in spec, (
            f"event window not bucket-partitioned: {ln}"
        )


def test_bucketed_plan_no_derived_key_exchanges(spark):
    """The r13 shared-exchange layout: every Exchange keys on the
    MATERIALIZED (_uc, _unull) attributes, never on a derived
    coalesce/isnull rewrite of user_id — the eqNullSafe join keys used
    to force two extra full-event Exchanges (one to co-partition the
    join, one more for the final window). With plain attribute keys
    the join-left window, the summary join, and the final window all
    ride one event exchange; only the summary branch's own pruned
    evaluation adds a second. Guard: no expression-keyed exchange, and
    at most TWO exchanges move event-level rows."""
    ev = spark.createDataFrame(_corpus()[:200], SCHEMA)
    df = sessionize(ev, GAP_MIN, bucket_hours=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    derived = [
        ln
        for ln in exchanges
        if "coalesce(user_id" in ln or "isnull(user_id" in ln
    ]
    assert not derived, (
        "exchange keyed on derived null-safe expressions (lost "
        "co-partitioning):\n" + "\n".join(derived)
    )
    # event-level exchanges are the ones keyed (_uc, _unull, _bkt);
    # summary-scale ones key (_uc, _unull) or (_s_uid, ...)
    ev_exchanges = [
        ln
        for ln in exchanges
        if "hashpartitioning(_uc" in ln and "_bkt" in ln
    ]
    assert len(ev_exchanges) <= 2, (
        "event table exchanged more than twice:\n"
        + "\n".join(ev_exchanges)
    )


def test_bucketed_null_user_and_validation(spark):
    """Null user_id rows are a real window partition in the plain path
    and must survive the bucketed summary join (null-safe, r10 review
    fix); null ts and bad bucket_hours raise loudly instead of
    silently dropping or mis-bucketing."""
    import pytest
    from datetime import timedelta

    rows = _corpus()[:80] + [
        (None, BASE + timedelta(minutes=m), 9000 + m, 1.0)
        for m in (0, 10, 200, 205)
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    plain = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(ev, GAP_MIN).collect()
    }
    bucketed = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(ev, GAP_MIN, bucket_hours=6).collect()
    }
    assert bucketed == plain
    assert sum(1 for (u, _) in plain if u is None) == 4

    with pytest.raises(ValueError, match="bucket_hours"):
        sessionize(ev, GAP_MIN, bucket_hours=0)
    with pytest.raises(ValueError, match="internal names"):
        sessionize(
            ev.withColumn("_bkt", F.lit(1)), GAP_MIN, bucket_hours=6
        )
    null_ts = spark.createDataFrame(
        [("u", None, 1, 1.0)], SCHEMA
    )
    with pytest.raises(Exception, match="null ts"):
        sessionize(null_ts, GAP_MIN, bucket_hours=6).collect()


def test_sessionize_full_internal_clash_set(spark):
    """The clash guard covers the summary-side internal names too
    (ADVICE r10): a column named _bflag/_base/_s_uid/_s_bkt raises the
    clear ValueError, not an ambiguous-column error mid-plan."""
    import pytest

    from postgresimporter_spark.operators.sessionize import sessionize

    ev = spark.createDataFrame(
        [("u", __import__("datetime").datetime(2024, 1, 1), 1, 1.0)],
        SCHEMA,
    )
    for bad in ["_bflag", "_base", "_s_uid", "_s_bkt", "_ibreaks"]:
        with pytest.raises(ValueError, match="internal names"):
            sessionize(
                ev.withColumn(bad, F.lit(1)), 30, bucket_hours=6
            )
