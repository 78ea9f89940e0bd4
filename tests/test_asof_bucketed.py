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


def test_bucketed_asof_plan_buckets_the_row_window(spark):
    """The row-level fill window must partition by (_k, _bkt); only the
    bucket-summary carry window (metadata scale) may partition by _k
    alone."""
    lrows, rrows = _corpus()
    ldf = spark.createDataFrame(lrows[:20], L_SCHEMA)
    rdf = spark.createDataFrame(rrows[:20], R_SCHEMA)
    plan = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        value_cols=["px"], bucket_hours=6,
    )._jdf.queryExecution().executedPlan().toString()
    row_windows = [
        ln for ln in plan.splitlines()
        if "Window [" in ln and "_skey" in ln and "last(_rv" in ln
    ]
    assert row_windows, "expected the row-level fill window"
    for ln in row_windows:
        assert "_bkt" in ln.split("windowspecdefinition(")[1], ln
