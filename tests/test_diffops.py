"""Unit tests for operators/diffops.py (snapshot diff, profile,
constraint validation) on small in-memory frames."""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.diffops import (
    check_constraints,
    profile_table,
    rule_foreign_key,
    rule_in_set,
    rule_not_null,
    rule_range,
    rule_unique,
    snapshot_diff,
)

OLD_ROWS = [
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, "c", 30.0),
    (4, "d", 40.0),
]
NEW_ROWS = [
    (1, "a", 10.0),       # unchanged
    (2, "b2", 20.0),      # changed (payload)
    (3, "c", 33.0),       # changed (other payload col)
    (5, "e", 50.0),       # added (4 removed)
]
SCHEMA = "k long, s string, v double"


def _frames(spark):
    return (
        spark.createDataFrame(OLD_ROWS, SCHEMA),
        spark.createDataFrame(NEW_ROWS, SCHEMA),
    )


def test_snapshot_diff_classifies(spark):
    old, new = _frames(spark)
    out = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_compare_subset(spark):
    # comparing only s: row 3 (v changed, s same) becomes unchanged
    old, new = _frames(spark)
    out = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["s"]
        ).collect()
    }
    assert out[3] == "unchanged"
    assert out[2] == "changed"


def test_snapshot_diff_payload_and_128(spark):
    old, new = _frames(spark)
    rows = {
        r["k"]: r
        for r in snapshot_diff(
            old, new, keys=["k"], include_payload=True, hash_bits=128
        ).collect()
    }
    assert rows[2]["old_s"] == "b" and rows[2]["new_s"] == "b2"
    assert rows[5]["old_s"] is None and rows[5]["new_s"] == "e"
    with pytest.raises(ValueError):
        snapshot_diff(old, new, keys=["k"], hash_bits=32)


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a long, b string"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["a"]["n_rows"] == 3
    assert prof["a"]["n_nulls"] == 0
    assert prof["a"]["n_distinct"] == 2
    assert prof["a"]["min_value"] == "1"
    assert prof["a"]["max_value"] == "2"
    assert prof["b"]["n_nulls"] == 1
    assert prof["b"]["n_distinct"] == 2
    # approx path returns the same answer at this scale
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(df, exact_distinct=False).collect()
    }
    assert approx["a"] == 2


def test_check_constraints(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, "F", -5.0),   # range violation
            (2, "Z", 20.0),   # in_set violation + duplicate k
            (None, "O", 30.0),  # not_null violation (k), fk skips null
        ],
        "k long, status string, v double",
    )
    parent = spark.createDataFrame([(1,)], "pk long")
    out = {
        r["rule"]: r["violations"]
        for r in check_constraints(
            df,
            [
                rule_not_null("k_not_null", "k"),
                rule_in_set("status_known", "status", ["O", "F"]),
                rule_range("v_range", "v", low=0.0, high=100.0),
                rule_unique("k_unique", ["k"]),
                rule_foreign_key("k_fk", ["k"], parent, ["pk"]),
            ],
        ).collect()
    }
    assert out == {
        "k_not_null": 1,
        "status_known": 1,
        "v_range": 1,
        # 4 rows - 2 distinct non-null k = 2 (null key counts, as SQL
        # COUNT(*) - COUNT(DISTINCT k) does)
        "k_unique": 2,
        "k_fk": 2,  # the two k=2 rows; null k skipped
    }
    with pytest.raises(ValueError):
        check_constraints(df, [{"kind": "nope", "rule": "r"}]).collect()


def test_check_constraints_clean_and_empty(spark):
    df = spark.createDataFrame([(1,)], "k long")
    out = check_constraints(df, [rule_not_null("ok", "k")]).collect()
    assert out[0]["violations"] == 0
    empty = check_constraints(df, [])
    assert empty.count() == 0
    assert empty.columns == ["rule", "violations"]
