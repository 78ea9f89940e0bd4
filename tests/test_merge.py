"""merge_upsert semantics: update-wins ties (idempotent re-apply),
inserts, version ordering, schema guard."""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.merge import merge_upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "val", "version"])


def test_update_replaces_and_insert_appends(spark):
    snap = _df(spark, [(1, "old", 1), (2, "keep", 1)])
    upd = _df(spark, [(1, "new", 2), (3, "ins", 2)])
    got = {r.k: (r.val, r.version) for r in merge_upsert(snap, upd, ["k"], "version").collect()}
    assert got == {1: ("new", 2), 2: ("keep", 1), 3: ("ins", 2)}


def test_stale_update_loses(spark):
    snap = _df(spark, [(1, "v5", 5)])
    upd = _df(spark, [(1, "v3", 3)])
    got = merge_upsert(snap, upd, ["k"], "version").collect()
    assert got[0].val == "v5"


def test_same_version_tie_goes_to_update_side(spark):
    """Re-applying a change batch must be idempotent: at equal version
    the update row wins over the already-merged base row."""
    snap = _df(spark, [(1, "base", 2)])
    upd = _df(spark, [(1, "redelivered", 2)])
    got = merge_upsert(snap, upd, ["k"], "version").collect()
    assert got[0].val == "redelivered"
    # second application changes nothing
    again = merge_upsert(
        merge_upsert(snap, upd, ["k"], "version"), upd, ["k"], "version"
    ).collect()
    assert again[0].val == "redelivered"


def test_schema_mismatch_raises(spark):
    snap = _df(spark, [(1, "a", 1)])
    bad = spark.createDataFrame([(1, 1)], ["k", "version"])
    with pytest.raises(ValueError):
        merge_upsert(snap, bad, ["k"], "version")
