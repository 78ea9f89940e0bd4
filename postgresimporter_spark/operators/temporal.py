"""Temporal join operators: as-of join, interval (range) join, and
time-bucket rollup with gap-fill.

These are net-new engine surface (no counterpart in the reference,
whose pipeline delegates all query work to Postgres — see
``/root/reference/postgresimporter/main.py``): they cover the temporal
operators a time-series / event workload needs that Spark does not ship
as built-ins (TimescaleDB's ``time_bucket_gapfill``, kdb's ``aj``,
Flink's interval join).

Scale design notes (the whole point of each implementation):

* ``asof_join`` is the **union-merge** formulation: tag both sides,
  union them, and run one ``last_value(..., ignoreNulls)`` window
  partitioned by the join key. Cost = ONE shuffle of (left + right) on
  the key, then a per-key sort — the same work a merge join would do.
  The naive alternative (theta-join on ``l.ts >= r.ts`` + groupBy max)
  is a range join that degenerates to per-key cartesian; at 100 TB a
  hot key with 1M left × 1M right rows explodes to 10^12 pairs, while
  the union-merge shape stays at 2M rows for that key.
* ``interval_join`` never evaluates point × interval pairs globally: it
  explodes each interval into the coarse time buckets it covers and
  equi-joins on the bucket, so Spark hash-partitions by bucket and only
  co-bucketed pairs are refined with the exact range predicate. Pick
  ``granularity`` ≈ typical interval length: each interval then explodes
  into ~2 rows and each point probes exactly one bucket. Wall-clock
  scales with data size, not |points| × |intervals|.
* ``time_bucket_gapfill`` aggregates FIRST (one shuffle on
  (bucket, group)), and only then densifies against the generated
  calendar — the dense grid is |buckets| × |groups| (metadata-scale),
  never touched by the raw-event scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = True,
    how: str = "left",
    direction: str = "backward",
    bucket_hours: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with the same key
    whose timestamp is before (``strict=True``: strictly before;
    ``strict=False``: at-or-before) the left row's timestamp.

    ``direction='forward'`` flips the match to the EARLIEST right row
    after (strictly after / at-or-after) the left timestamp — same
    union-merge cost, just a descending merge order.

    Single-shuffle union-merge (see module docstring). Output: all left
    columns plus ``asof_<col>`` for each requested right value column
    and ``asof_ts`` (the matched right timestamp; null when no match and
    ``how='left'``). ``how='inner'`` drops unmatched left rows.

    Ties: when several right rows share the qualifying max timestamp,
    the one sorting last by timestamp wins per ``last_value`` over the
    (ts, tag) order — callers needing total determinism should ensure
    (key, ts) is unique on the right, or pre-aggregate. With
    ``bucket_hours`` set, cross-bucket carry-in additionally resolves
    such ties via a window-free ``max_by`` aggregate, independently of
    the within-bucket fill window's tie order — so on inputs that
    VIOLATE this contract, carry-in and within-bucket values for the
    same duplicate (key, ts) can disagree inside one output (ADVICE
    r11); within the contract the two paths are identical.

    ``bucket_hours`` (r10 hot-key scale path, same decomposition as
    ``sessionize``): the single per-key window puts every row of a key
    into one task, so a hot instrument (one symbol carrying most of
    the tape) serializes — measured, a 22M-row key ran 81s warm with
    31 idle cores. The bucketed path fills within (key, time-bucket)
    windows — bounded, parallel — then resolves the per-column
    carry-in over per-bucket summary rows (the bucket's last non-null
    value per column, a metadata-scale running ``last`` per key), and
    coalesces. Output identical by construction (unit-tested row for
    row, per-column independent null skips included). Requires
    timestamp-typed, non-null ``left_ts``/``right_ts``. Both
    directions supported (forward carries from LATER buckets)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    lcols = left.columns
    # tag order at equal ts: strict -> left first (right row at the same
    # instant must NOT be visible yet); non-strict -> right first.
    # The same tag assignment serves both directions because 'forward'
    # only flips the timestamp sort, not the equal-ts visibility rule.
    left_tag, right_tag = (0, 1) if strict else (1, 0)

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_tag"),
        F.lit(True).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
            for c in value_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_tag"),
        F.lit(False).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    fill_cols = [(f"_rv_{c}", f"asof_{c}") for c in value_cols] + [
        ("_rts", "asof_ts")
    ]
    if bucket_hours is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(ts_order, F.col("_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            "*",
            *[
                F.last(src, ignorenulls=True).over(w).alias(dst)
                for src, dst in fill_cols
            ],
        )
    else:
        from pyspark.sql.types import TimestampType

        if bucket_hours < 1:
            raise ValueError(
                f"bucket_hours must be >= 1, got {bucket_hours} (0 "
                "would null every bucket via division, negative would "
                "reverse the carry order)"
            )
        for df, col in ((left, left_ts), (right, right_ts)):
            if not isinstance(df.schema[col].dataType, TimestampType):
                raise ValueError(
                    "bucket_hours requires timestamp-typed join "
                    f"timestamps; {col!r} is "
                    f"{df.schema[col].dataType.simpleString()}"
                )
        # every internal name the branch generates, not just the first
        # tier (ADVICE r10: a left column named _wf0 passed the old
        # guard and failed later as an ambiguous-column
        # AnalysisException deep in the plan instead of a clear error)
        internal = {
            "_ts_us", "_bkt", "_skey", "_c_k", "_c_bkt",
            "_kc", "_knull", "_c_knull",
        }
        internal.update(f"_wf{i}" for i in range(len(value_cols) + 1))
        internal.update(f"_bl{i}" for i in range(len(value_cols) + 1))
        internal.update(f"_ci{i}" for i in range(len(value_cols) + 1))
        clash = internal.intersection(lcols)
        if clash:
            raise ValueError(
                "bucketed asof_join: left columns collide with "
                f"internal names: {sorted(clash)}"
            )
        bucket_us = bucket_hours * 3600 * 1_000_000
        # null timestamps are rejected loudly: the docstring requires
        # non-null join timestamps for this path, and a silent drop
        # through the bucket join would be worse than the error
        ts_us = F.when(
            F.col("_ts").isNotNull(), F.unix_micros(F.col("_ts"))
        ).otherwise(
            F.raise_error(
                F.lit("asof_join(bucket_hours=...): null join "
                      "timestamp; filter or impute before the "
                      "bucketed as-of join")
            )
        )
        # one long sort key equal to (ts_order, tag asc): backward
        # 2*ts_us + tag ascending; forward -2*ts_us + tag ascending
        # (smaller ts -> larger key -> later in scan order)
        sgn = 2 if direction == "backward" else -2
        unioned = unioned.withColumn("_ts_us", ts_us).withColumn(
            "_bkt", F.floor(F.col("_ts_us") / F.lit(bucket_us))
        ).withColumn(
            "_skey", F.col("_ts_us") * sgn + F.col("_tag")
        )
        # Null-safe carry-join key WITHOUT eqNullSafe (r13, same fix as
        # sessionize): `_k <=> _c_k` rewrites the join keys to
        # coalesce/isnull EXPRESSIONS no upstream
        # HashPartitioning(_k, _bkt) satisfies, so the planner
        # re-exchanged the full union for the carry join. Materialize
        # the rewrite as columns and key every phase on them: the fill
        # window, the summary aggregate, and the carry join share one
        # full-data exchange. (_kc, _knull) determines _k exactly — a
        # sentinel collision with a real key value still differs on
        # _knull.
        from pyspark.sql import types as _T

        kt = unioned.schema["_k"].dataType
        if isinstance(kt, _T.StringType):
            _ksent = F.lit("")
        elif isinstance(kt, _T.NumericType):
            _ksent = F.lit(0).cast(kt)
        else:
            _ksent = None
        if _ksent is None:
            # exotic key type: single-field struct compares its null
            # field as equal under plain `=` (container semantics),
            # keeping the shared-exchange shape at interpreted-sort
            # cost
            unioned = unioned.withColumn(
                "_kc", F.struct("_k")
            ).withColumn("_knull", F.lit(False))
        else:
            unioned = unioned.withColumn(
                "_kc", F.coalesce(F.col("_k"), _ksent)
            ).withColumn("_knull", F.col("_k").isNull())
        wb = (
            Window.partitionBy("_kc", "_knull", "_bkt")
            .orderBy("_skey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = unioned.select(
            "*",
            *[
                F.last(src, ignorenulls=True).over(wb).alias(f"_wf{i}")
                for i, (src, _) in enumerate(fill_cols)
            ],
        )
        # per-bucket summary: each column's last non-null RAW value in
        # scan order — max_by over (skey where the value is non-null),
        # a plain aggregate of the pre-window branch. This equals the
        # fill window's value at the bucket's last row BY DEFINITION
        # whenever _skey is total per (key, bucket), i.e. no duplicate
        # (ts, tag) rows per key — the same tie contract the Ties
        # paragraph already places on callers (and on which the plain
        # path's own output is order-unstable anyway). Computing it
        # window-free keeps ONE window evaluation in the whole plan
        # without checkpointing the full union (r11: the full-row
        # localCheckpoint materialized every column of left+right and
        # cost more than the second read it saved — asof_hot 2.38s ->
        # 1.88s same-session min-of-3 on removal, output identical).
        summ = unioned.groupBy("_kc", "_knull", "_bkt").agg(
            *[
                F.max_by(
                    src, F.when(F.col(src).isNotNull(), F.col("_skey"))
                ).alias(f"_bl{i}")
                for i, (src, _) in enumerate(fill_cols)
            ]
        )
        bkt_order = (
            F.col("_bkt").asc()
            if direction == "backward"
            else F.col("_bkt").desc()
        )
        wu = (
            Window.partitionBy("_kc", "_knull")
            .orderBy(bkt_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = summ.select(
            F.col("_kc").alias("_c_k"),
            F.col("_knull").alias("_c_knull"),
            F.col("_bkt").alias("_c_bkt"),
            *[
                F.last(f"_bl{i}", ignorenulls=True)
                .over(wu)
                .alias(f"_ci{i}")
                for i in range(len(fill_cols))
            ],
        )
        # null-safe on the join key: a null key is a real window
        # partition in the plain path; the materialized (_kc, _knull)
        # pair makes plain `=` keep those rows (see key-column note
        # above)
        filled = within.join(
            carry,
            (F.col("_kc") == F.col("_c_k"))
            & (F.col("_knull") == F.col("_c_knull"))
            & (F.col("_bkt") == F.col("_c_bkt")),
        ).select(
            "*",
            *[
                F.coalesce(F.col(f"_wf{i}"), F.col(f"_ci{i}")).alias(dst)
                for i, (_, dst) in enumerate(fill_cols)
            ],
        )
    out = filled.where(F.col("_is_left")).select(
        *lcols,
        *[F.col(f"asof_{c}") for c in value_cols],
        "asof_ts",
    )
    if how == "inner":
        out = out.where(F.col("asof_ts").isNotNull())
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    granularity_s: int,
    broadcast_intervals: bool = False,
    key_cols: Sequence[str] = (),
    max_buckets_per_interval: int = 100_000,
    multi_level: bool = False,
) -> DataFrame:
    """Join each point row to every interval row whose half-open range
    ``[start, end)`` contains the point's timestamp.

    Bucketed candidate generation (see module docstring): intervals
    explode into the ``granularity_s``-second buckets they cover, points
    map to exactly one bucket, the join is an equi-join on the bucket
    refined by the exact range predicate. No pair outside a shared
    bucket is ever materialized. Each (point, interval) match appears
    exactly once — an interval covers a given bucket at most once.

    ``broadcast_intervals=True`` hints the exploded interval side as a
    broadcast build (right when intervals are metadata-scale, e.g. an
    incident or maintenance-window table).

    ``key_cols`` (same names on both sides) join as additional
    equi-keys ALONGSIDE the bucket — the per-entity variant (user
    sessions, device windows): candidates are per (key, bucket), so a
    busy global time bucket no longer crosses entities. This is the
    shape to use whenever the interval semantics are keyed; the keyed
    join also spreads the shuffle across the key space.

    ``max_buckets_per_interval`` (r10): an interval RAISES at
    execution when it would explode into more than this many buckets
    — an interval much longer than the granularity (a year-long
    maintenance window at 60s buckets = 525,600 bucket rows, built as
    one in-row sequence array BEFORE exploding) OOMs silently
    otherwise (measured: 200 such intervals killed an 8g heap before
    the join ran). The error names the fix: coarser granularity, or
    split long intervals, or route mixed-duration corpora through a
    multi-resolution formulation (``multi_level=True``). Loud
    failure, never a silent cap: no interval is dropped or trimmed.

    ``multi_level=True`` (r11): the MIXED-duration formulation. A
    single global granularity has no good value when interval lengths
    span orders of magnitude (the maintenance-window shape: thousands
    of 10-minute incidents plus a few year-long windows): fine buckets
    explode each long interval into span/granularity in-row sequence
    rows (measured r10: 200 year-long intervals at 60s buckets =
    525,600-element arrays each, OOM on an 8g heap before the join
    ran), while coarse buckets funnel every point into a handful of
    global bucket keys. The multi-resolution rewrite (the standard
    binned range-join technique from the interval-tree literature)
    removes the global knob:

    * level-``l`` buckets are ``granularity_s * 2**l`` seconds wide;
    * each interval is assigned to the SMALLEST level whose bucket
      width >= its duration, so it covers AT MOST 2 buckets at its own
      level — the explosion factor is <= 2 regardless of duration;
    * each point probes exactly one bucket per DISTINCT LEVEL PRESENT
      in the interval side (the level set is collected driver-side —
      it is bounded by ~60 values and typically 1-3);
    * the join is an equi-join on (level, bucket) [+ ``key_cols``]
      refined by the exact range predicate. An interval lives at
      exactly one level and a point probes one bucket per level, so
      each matching pair is emitted exactly once.

    ``granularity_s`` becomes the FINEST width (match it to the
    SHORTEST typical interval); ``max_buckets_per_interval`` is
    irrelevant (nothing ever explodes past 2 rows). Level assignment
    and bucketing use exact integer microsecond arithmetic (float
    ``log2`` is used only as a first guess, then corrected against
    exact powers of two), so boundary durations can never land on a
    level too fine for them. The distinct-level collect evaluates the
    interval side once before the join — cache ``intervals`` first if
    it is expensive to recompute (it is metadata-scale in this shape).
    """
    if multi_level:
        return _interval_join_multilevel(
            points,
            intervals,
            point_ts,
            start_col,
            end_col,
            granularity_s,
            broadcast_intervals,
            key_cols,
        )
    bucket = (F.unix_micros(F.col(point_ts).cast("timestamp")) / F.lit(1_000_000)).cast(
        "long"
    ) / F.lit(granularity_s)
    p = points.withColumn("_bucket", F.floor(bucket).cast("long"))

    s_sec = (
        F.unix_micros(F.col(start_col).cast("timestamp")) / F.lit(1_000_000)
    ).cast("long")
    # end is exclusive: last covered bucket is floor((end - 1us) / g);
    # integer floor on seconds is enough because granularity >= 1s
    e_sec = (
        (F.unix_micros(F.col(end_col).cast("timestamp")) - F.lit(1))
        / F.lit(1_000_000)
    ).cast("long")
    b_lo = F.floor(s_sec / F.lit(granularity_s)).cast("long")
    b_hi = F.floor(e_sec / F.lit(granularity_s)).cast("long")
    n_buckets = b_hi - b_lo + 1
    checked_hi = F.when(
        n_buckets <= F.lit(max_buckets_per_interval), b_hi
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: an interval spans more than "
                    f"{max_buckets_per_interval} buckets at "
                    f"granularity_s={granularity_s} ("
                ),
                n_buckets.cast("string"),
                F.lit(
                    " buckets); coarsen granularity_s, split long "
                    "intervals, or raise max_buckets_per_interval"
                ),
            )
        )
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(b_lo, checked_hi)),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        p.join(iv, on=[*key_cols, "_bucket"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )


def _floor_div_expr(col_name: str, divisor: int) -> Column:
    """Exact floor division of a long column by a positive int literal.

    Pure integer arithmetic: SQL ``div`` truncates toward zero, so the
    quotient is corrected down when the remainder is negative. Never
    routed through doubles — epoch-microsecond magnitudes sit near
    2**53 where double division can mis-floor by one at multiples.
    """
    q = F.expr(f"{col_name} div CAST({divisor} AS BIGINT)")
    r = F.expr(f"{col_name} % CAST({divisor} AS BIGINT)")
    return F.when(r < 0, q - 1).otherwise(q)


def _interval_join_multilevel(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    granularity_s: int,
    broadcast_intervals: bool,
    key_cols: Sequence[str],
) -> DataFrame:
    """Multi-resolution bucketed interval join (see ``interval_join``
    docstring, ``multi_level=True``). Exact-integer level assignment:
    float ``log2`` only proposes a level; the final pick is the
    smallest of {l0-1, l0, l0+1} whose exact power of two covers the
    duration ratio, so an interval can never land on a level whose
    bucket is narrower than the interval (which would make it span 3
    buckets and silently miss middle-bucket points).

    Skew posture (r11 probe): the top level has FEW distinct buckets
    corpus-wide (span / largest width), so the unkeyed shuffle-join
    path concentrates probe rows there — measured on 2M points with a
    1M-interval non-broadcast side plus 200 year-long intervals:
    completes in 14.4s with the cost OUTPUT-BOUND (230M pairs — an
    interval containing N points inherently emits N rows), AQE sizing
    the few-bucket exchange; there is no quadratic axis because each
    interval still explodes to <= 2 rows. Keyed or broadcast variants
    avoid even that concentration.
    """
    if granularity_s < 1:
        raise ValueError(
            f"granularity_s must be >= 1, got {granularity_s}"
        )
    p_internal = {"_pbase", "_probe", "_lvl", "_bucket"}
    iv_internal = {
        "_s_us", "_e_us", "_ratio", "_l0", "_lvl", "_base_lo",
        "_base_hi", "_bucket",
    }
    for side, df, names in (
        ("points", points, p_internal),
        ("intervals", intervals, iv_internal),
    ):
        clash = names.intersection(df.columns)
        if clash:
            raise ValueError(
                f"interval_join(multi_level=True): {side} columns "
                f"clash with internal names {sorted(clash)}; rename "
                "them before the join"
            )
    g_us = granularity_s * 1_000_000
    # Largest level whose bucket width g_us * 2**l still fits in a
    # long. For granularity_s=60 this is level 36 (~4 million years of
    # bucket width) — unreachable by sane data, but a malformed
    # timestamp pair must raise with attribution, not overflow.
    max_level = 62 - g_us.bit_length()

    def p2(lvl: Column) -> Column:
        # 2**l exactly: powers of two are exact in double up to 2**62,
        # and the cast back to long is exact below 2**63.
        return F.pow(F.lit(2.0), lvl.cast("double")).cast("long")

    iv = intervals.withColumn(
        "_s_us", F.unix_micros(F.col(start_col).cast("timestamp"))
    ).withColumn(
        "_e_us", F.unix_micros(F.col(end_col).cast("timestamp"))
    )
    # ratio = ceil(duration / g) in pure integer arithmetic; empty or
    # null intervals clamp to 1 (level 0) and match nothing downstream,
    # identical to the exact range predicate's SQL semantics.
    iv = iv.withColumn(
        "_ratio",
        F.greatest(
            F.expr(
                f"(_e_us - _s_us + CAST({g_us - 1} AS BIGINT)) "
                f"div CAST({g_us} AS BIGINT)"
            ),
            F.lit(1).cast("long"),
        ),
    ).withColumn("_l0", F.ceil(F.log2(F.col("_ratio"))).cast("int"))
    lvl = (
        F.when(
            (F.col("_l0") > 0) & (p2(F.col("_l0") - 1) >= F.col("_ratio")),
            F.col("_l0") - 1,
        )
        .when(p2(F.col("_l0")) >= F.col("_ratio"), F.col("_l0"))
        .otherwise(F.col("_l0") + 1)
    )
    lvl_checked = F.when(lvl <= F.lit(max_level), lvl).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join(multi_level=True): an interval's "
                    f"duration needs bucket level "
                ),
                lvl.cast("string"),
                F.lit(
                    f" but level {max_level} is the widest that fits "
                    f"in a long at granularity_s={granularity_s}; the "
                    "interval's timestamps are almost certainly "
                    "corrupt (a multi-million-year span)"
                ),
            )
        )
    )
    iv = iv.withColumn("_lvl", lvl_checked.cast("int"))
    # Nested-floor identity: floor(x / (g * 2**l)) equals the level-0
    # bucket arithmetically shifted right by l (arithmetic shift floors
    # negatives), so one exact div per timestamp serves every level.
    iv = (
        iv.withColumn("_base_lo", _floor_div_expr("_s_us", g_us))
        .withColumn(
            "_base_hi",
            F.when(
                F.col("_e_us").isNotNull(),
                _floor_div_expr("(_e_us - 1)", g_us),
            ),
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr("shiftright(_base_lo, _lvl)"),
                        F.expr("shiftright(_base_hi, _lvl)"),
                    )
                )
            ),
        )
        .drop("_s_us", "_e_us", "_ratio", "_l0", "_base_lo", "_base_hi")
    )

    # Metadata-scale collect: the level set is bounded by max_level
    # (~60) values and typically 1-3. This evaluates the interval side
    # once before the join — it is the small side in this shape; cache
    # it first if it is expensive to recompute.
    level_rows = iv.select("_lvl").distinct().collect()
    levels = sorted(r["_lvl"] for r in level_rows if r["_lvl"] is not None)
    if not levels:
        # Empty interval side: keep the plan shape (and output schema)
        # with a single dead probe level; the inner join against zero
        # interval rows returns the correctly-typed empty result.
        levels = [0]

    if broadcast_intervals:
        iv = F.broadcast(iv)

    p = points.withColumn(
        "_pbase",
        _floor_div_expr(
            f"unix_micros(CAST({point_ts} AS TIMESTAMP))", g_us
        ),
    )
    probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(l).cast("int").alias("_lvl"),
                    F.shiftright(F.col("_pbase"), l).alias("_bucket"),
                )
                for l in levels
            ]
        )
    ).alias("_probe")
    p = p.select("*", probe).select(
        *points.columns,
        F.col("_probe._lvl").alias("_lvl"),
        F.col("_probe._bucket").alias("_bucket"),
    )
    return (
        p.join(iv, on=[*key_cols, "_lvl", "_bucket"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_lvl", "_bucket")
    )


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Hypertable-style rollup: aggregate into fixed time buckets, then
    densify so every (bucket, group) combination in the observed span
    appears — TimescaleDB's ``time_bucket_gapfill`` semantics.

    ``bucket`` is a window width for ``date_trunc`` ('hour', 'day', ...).
    ``aggs`` are aggregate Columns (already aliased). ``fill`` maps
    output column name -> fill expression for gap rows (default: leave
    nulls).

    The raw scan only feeds the FIRST aggregation; the dense calendar is
    sequence()-generated from the global min/max bucket (a 2-row
    aggregate) crossed with the distinct groups — metadata-scale work.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("_bucket_ts")
    agg = df.groupBy(b, *[F.col(c) for c in group_cols]).agg(*aggs)

    step = F.expr(f"INTERVAL 1 {bucket}")
    span = df.select(
        F.date_trunc(bucket, F.min(ts_col)).alias("lo"),
        F.date_trunc(bucket, F.max(ts_col)).alias("hi"),
    )
    calendar = span.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), step)).alias(
            "_bucket_ts"
        )
    )
    groups = df.select(*group_cols).distinct()
    dense = calendar.crossJoin(groups)

    out = dense.join(agg, on=["_bucket_ts", *group_cols], how="left")
    if fill:
        out = out.select(
            *[
                F.coalesce(F.col(c), fill[c]).alias(c)
                if c in fill
                else F.col(c)
                for c in out.columns
            ]
        )
    return out.withColumnRenamed("_bucket_ts", "bucket_ts")


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION — TimescaleDB's
    ``interpolate()`` / Pandas ``DataFrame.interpolate('time')``
    semantics, distributed: bucket-average the series per key, densify
    the calendar (via :func:`time_bucket_gapfill`), then fill each
    missing bucket with the straight line between its nearest observed
    neighbors. Buckets before the first / after the last observation of
    a key stay NULL (no extrapolation).

    Scale shape: one groupBy shuffle for the bucket aggregate, then two
    windows over the SAME (key) partitioning — Catalyst plans a single
    exchange for both window frames; no unpartitioned window exists and
    per-key state is the key's bucket count, bounded by span/bucket.

    Determinism (oracle hash-exact): the bucket mean is an exact
    decimal sum with ONE IEEE double division; the interpolation
    fraction divides two epoch-microsecond bigints cast to double, and
    the fill is computed in the fixed shape ``prev + (next - prev) *
    frac`` — identical operation order in the DuckDB oracle (q152).

    Returns (key..., bucket_ts, v_obs, v_filled, is_observed).
    """
    mean = (
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
        / F.count(value_col)
    ).alias("v_obs")
    dense = time_bucket_gapfill(
        df, ts_col, bucket, list(key_cols), [mean]
    )

    keys = [F.col(c) for c in key_cols]
    t = F.unix_micros(F.col("bucket_ts"))
    wp = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("v_obs").isNotNull(), t)
    prev_v = F.last("v_obs", ignorenulls=True).over(wp)
    prev_t = F.last(obs_t, ignorenulls=True).over(wp)
    next_v = F.first("v_obs", ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)

    frac = (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = prev_v + (next_v - prev_v) * frac
    filled = F.coalesce(
        F.col("v_obs"),
        F.when(prev_v.isNotNull() & next_v.isNotNull(), interp),
    )
    return dense.select(
        *key_cols,
        "bucket_ts",
        "v_obs",
        filled.alias("v_filled"),
        F.col("v_obs").isNotNull().alias("is_observed"),
    )


__all__ = [
    "asof_join",
    "interval_join",
    "time_bucket_gapfill",
    "interpolate_linear",
    "ewma",
]


def ewma(
    df: DataFrame,
    alpha_pct: int = 25,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average — the recursive
    smoother ``s_i = α·x_i + (1-α)·s_{i-1}`` (s_0 = first value),
    folded over the key's events in (ts, order_col) order. Returns one
    row per key: (key, n_events, ewma).

    Recursion can't ride a Spark window, so the fold runs over a
    per-key SORTED array: one groupBy shuffle, then pure array math.
    Engine-portable determinism: α is passed in integer percent and
    becomes an exact binary-fraction literal pair (25% → 0.25/0.75),
    the sort key (ts, order_col) is a total order, and both engines
    fold left-to-right over the identical sequence — bit-identical
    before the final round. Per-key state is the key's own event
    array; a pathologically hot key should be capped upstream (same
    caveat as ``curation.pack_sequences`` shards).
    """
    a = alpha_pct / 100.0
    ev = df.select(
        F.col(key_col),
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(order_col).alias("o"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("_e"),
    )
    per = ev.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_sort(F.collect_list("_e")).alias("_arr"),
    )
    vals = F.transform(F.col("_arr"), lambda x: x["v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.size(vals)),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return per.select(
        key_col,
        "n_events",
        F.round(folded, round_digits).alias("ewma"),
    )


def cusum_scaled(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-series CUSUM deviation curve in exact scaled integers.

    CUSUM against the series mean is S_i = sum_{j<=i}(x_j - mean); the
    mean is rational, so everything is scaled by n (the series length):
    ``s_scaled_i = n * cumsum_i - i * total`` — pure BIGINT arithmetic,
    bit-identical across engines and partition orders. The changepoint
    candidate is argmax |S| (Page 1954's decision statistic at its
    simplest: one pass, no tuning parameters).

    Shape: one groupBy for (n, total) per key, joined back (O(|keys|)
    rows — AQE broadcasts when it fits), then a per-key ordered window
    for the cumulative sum — partitioned by the series key, never
    global. Returns the input + (n_points, s_scaled).
    """
    keys = list(key_cols)
    stats = series.groupBy(*keys).agg(
        F.count("*").cast("long").alias("_n"),
        F.sum(F.col(value_col)).cast("long").alias("_total"),
    )
    w = Window.partitionBy(*keys).orderBy(order_col)
    joined = series.join(stats, on=keys)
    cum = F.sum(F.col(value_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    idx = F.row_number().over(w)
    return joined.select(
        *keys,
        order_col,
        F.col(value_col),
        F.col("_n").alias("n_points"),
        (F.col("_n") * cum - idx * F.col("_total"))
        .cast("long")
        .alias("s_scaled"),
    )


def lag_autocorr(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-series autocorrelation at lags 1..``max_lag`` with an
    integer-exact numerator/denominator.

    With y_i = n*x_i - total (the mean-centered value scaled by n —
    BIGINT, no float), r_k = Σ y_i·y_{i+k} / Σ y_i² exactly (the n²
    scale cancels). One ordered window per series supplies the lagged
    columns; the single double division happens once per (key, lag).

    Returns key_cols + (lag, num, den, acf DOUBLE rounded 6). The
    series is the OBSERVED ordered sequence — callers gap-fill first
    if calendar-lag semantics are needed (``time_bucket_gapfill``).
    """
    keys = list(key_cols)
    stats = series.groupBy(*keys).agg(
        F.count("*").cast("long").alias("_n"),
        F.sum(F.col(value_col)).cast("long").alias("_total"),
    )
    w = Window.partitionBy(*keys).orderBy(order_col)
    y = (F.col("_n") * F.col(value_col) - F.col("_total")).cast("long")
    base = series.join(stats, on=keys).select(
        *keys, F.col(order_col), y.alias("_y"),
        *[
            F.lead(y, k).over(w).alias(f"_y{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stacked = base.select(
        *keys,
        "_y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"_y{k}").alias("yl"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("_l"),
    )
    per = stacked.groupBy(*keys, F.col("_l.lag").alias("lag")).agg(
        F.sum(F.when(F.col("_l.yl").isNotNull(), F.col("_y") * F.col("_l.yl")))
        .cast("long")
        .alias("num"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("den"),
    )
    return per.select(
        *keys,
        "lag",
        "num",
        "den",
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6).alias(
            "acf"
        ),
    )
