"""Bucketed as-of join must equal the plain per-key-window path ROW
FOR ROW — the r10 hot-instrument scale fix (a 22M-row key pinned the
plain path on one straggler task, 81s warm; bucketed ran 3.4x faster
with identical output at the probe scale).

The fixture stresses the decomposition's boundaries: right rows
exactly on bucket edges, equal left/right timestamps under both
strictness rules, per-column INDEPENDENT null right values (each
column carries from a different bucket), keys present on one side
only, multi-bucket gaps, and both directions.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from postgresimporter_spark.operators.temporal import asof_join

BASE = datetime(2024, 5, 1)
L_SCHEMA = "lid long, k string, ts timestamp, qty double"
R_SCHEMA = "k string, ts timestamp, px double, sz double"


def _corpus():
    rnd = random.Random(41)
    lrows, rrows = [], []
    lid = 0
    for k in ["hot", "a", "b", "left_only"]:
        n_r = 400 if k == "hot" else 30
        t = BASE
        for _ in range(0 if k == "left_only" else n_r):
            # px and sz go null INDEPENDENTLY so their carries differ
            px = None if rnd.random() < 0.3 else round(rnd.uniform(1, 9), 2)
            sz = None if rnd.random() < 0.3 else float(rnd.randint(1, 99))
            rrows.append((k, t, px, sz))
            r = rnd.random()
            if r < 0.2:
                t = t + timedelta(hours=6)  # exactly on a 6h bucket edge
            elif r < 0.3:
                t = t + timedelta(hours=rnd.choice([13, 25]))  # empty buckets
            else:
                t = t + timedelta(minutes=rnd.uniform(1, 200))
        t = BASE + timedelta(minutes=rnd.uniform(0, 30))
        for _ in range(200 if k == "hot" else 25):
            lrows.append((lid, k, t, float(lid % 7)))
            lid += 1
            if rnd.random() < 0.25 and rrows:
                # land exactly on an existing right ts: strictness edge
                t = rnd.choice([r[1] for r in rrows if r[0] == k] or [t])
            else:
                t = t + timedelta(minutes=rnd.uniform(1, 300))
    return lrows, rrows


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [True, False])
def test_bucketed_asof_equals_plain(spark, direction, strict):
    lrows, rrows = _corpus()
    ldf = spark.createDataFrame(lrows, L_SCHEMA)
    rdf = spark.createDataFrame(rrows, R_SCHEMA)
    kw = dict(
        on="k",
        left_ts="ts",
        right_ts="ts",
        value_cols=["px", "sz"],
        strict=strict,
        direction=direction,
    )
    plain = {
        r.lid: (r.asof_px, r.asof_sz, r.asof_ts)
        for r in asof_join(ldf, rdf, **kw).collect()
    }
    assert len(plain) == len(lrows)
    for bh in (1, 6, 48):
        bucketed = {
            r.lid: (r.asof_px, r.asof_sz, r.asof_ts)
            for r in asof_join(ldf, rdf, bucket_hours=bh, **kw).collect()
        }
        assert bucketed == plain, f"bucket_hours={bh}"
    # the fixture actually exercises independent carries and misses:
    # right rows where exactly one of px/sz is null force the two
    # columns' last-non-null fills to come from different rows
    assert any(px is None and sz is not None for _, _, px, sz in rrows)
    assert any(px is not None and sz is None for _, _, px, sz in rrows)
    assert any(v[2] is None for v in plain.values())  # left_only key


def test_bucketed_asof_inner_drops_unmatched(spark):
    lrows, rrows = _corpus()
    ldf = spark.createDataFrame(lrows, L_SCHEMA)
    rdf = spark.createDataFrame(rrows, R_SCHEMA)
    kw = dict(on="k", left_ts="ts", right_ts="ts", value_cols=["px"],
              how="inner")
    plain = {r.lid for r in asof_join(ldf, rdf, **kw).collect()}
    bucketed = {
        r.lid
        for r in asof_join(ldf, rdf, bucket_hours=6, **kw).collect()
    }
    assert bucketed == plain
    assert len(plain) < len(lrows)


def test_bucketed_asof_rejects_non_timestamp(spark):
    ldf = spark.createDataFrame([(1, "k", 5, 1.0)],
                                "lid long, k string, ts long, qty double")
    rdf = spark.createDataFrame([("k", 4, 2.0)],
                                "k string, ts long, px double")
    with pytest.raises(ValueError, match="timestamp-typed"):
        asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts",
                  value_cols=["px"], bucket_hours=6)


def test_bucketed_asof_plan_shape(spark):
    """The visible plan (the fill window sits behind a localCheckpoint
    since the r10 review pass — it feeds both the summary and the
    final join) must contain only metadata-scale per-key windows: any
    Window ordering by the row-level sort key `_skey` must partition
    by `_bkt` too, and the carry window may partition by `_k` alone
    only while ordering by `_bkt` (bucket-summary rows). A
    row-per-event per-key window reappearing here is the hot-key
    regression; the `asof_hot` bench guard is the wall-clock sentinel
    for the checkpointed section."""
    lrows, rrows = _corpus()
    ldf = spark.createDataFrame(lrows[:20], L_SCHEMA)
    rdf = spark.createDataFrame(rrows[:20], R_SCHEMA)
    plan = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        value_cols=["px"], bucket_hours=6,
    )._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows, "expected the carry window at least"
    for ln in windows:
        spec = ln.split("windowspecdefinition(")[1]
        if "_skey" in spec:
            assert "_bkt" in spec, f"row-level window not bucketed: {ln}"
        else:
            # carry window: per key over bucket-summary rows only
            assert "_bkt" in ln, f"unexpected per-key window: {ln}"


def test_bucketed_asof_null_key_and_validation(spark):
    """Null join-key rows are a real window partition in the plain
    path and must survive the bucketed carry join (null-safe, r10
    review fix); bucket_hours=0, internal-name collisions, and null
    timestamps raise loudly instead of silently dropping rows or
    reversing the carry order."""
    lrows, rrows = _corpus()
    lrows = lrows[:40] + [
        (9000 + i, None, BASE + timedelta(minutes=30 * i), 1.0)
        for i in range(4)
    ]
    rrows = rrows[:40] + [
        (None, BASE + timedelta(minutes=10 + 60 * i), 5.0 + i, 2.0)
        for i in range(3)
    ]
    ldf = spark.createDataFrame(lrows, L_SCHEMA)
    rdf = spark.createDataFrame(rrows, R_SCHEMA)
    kw = dict(on="k", left_ts="ts", right_ts="ts", value_cols=["px"])
    plain = {
        r.lid: (r.asof_px, r.asof_ts)
        for r in asof_join(ldf, rdf, **kw).collect()
    }
    bucketed = {
        r.lid: (r.asof_px, r.asof_ts)
        for r in asof_join(ldf, rdf, bucket_hours=6, **kw).collect()
    }
    assert bucketed == plain
    assert len(plain) == len(lrows)  # the null-key left rows survive
    assert any(plain[9000 + i][0] is not None for i in range(4))

    import pytest

    with pytest.raises(ValueError, match="bucket_hours"):
        asof_join(ldf, rdf, bucket_hours=0, **kw)
    with pytest.raises(ValueError, match="internal names"):
        asof_join(
            ldf.withColumn("_bkt", F.lit(1)), rdf, bucket_hours=6, **kw
        )
    null_ts_l = spark.createDataFrame(
        [(1, "k", None, 1.0)], L_SCHEMA
    )
    with pytest.raises(Exception, match="null join"):
        asof_join(null_ts_l, rdf, bucket_hours=6, **kw).collect()


def test_bucketed_asof_full_internal_clash_set(spark):
    """The clash guard covers EVERY internal name the branch generates
    (ADVICE r10): a left column named _wf0 or _ci0 raises the clear
    ValueError, not an ambiguous-column AnalysisException mid-plan."""
    import datetime as dt

    import pytest

    from postgresimporter_spark.operators.temporal import asof_join

    t0 = dt.datetime(2024, 1, 1)
    right = spark.createDataFrame(
        [(1, t0, 5.0)], "k long, ts timestamp, v double"
    )
    for bad in ["_wf0", "_ci0", "_c_k", "_c_bkt", "_bl0"]:
        left = spark.createDataFrame(
            [(1, t0, 1.0)], f"k long, ts timestamp, `{bad}` double"
        )
        with pytest.raises(ValueError, match="internal names"):
            asof_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                value_cols=["v"], bucket_hours=6,
            )
