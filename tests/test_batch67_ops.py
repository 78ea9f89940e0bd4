"""Batch-67: Bellman-Ford vs a sequential Python relaxation, and the
type-inference rules on hand-built edge cases."""

from __future__ import annotations


def test_bellman_ford_matches_python_model(spark):
    from postgresimporter_spark.operators.graph import bellman_ford

    # weighted diamond + tail: shortest path must prefer 1+1 over 5
    pairs = [(0, 1, 1), (1, 2, 1), (0, 2, 5), (2, 3, 2), (4, 5, 7)]
    e = spark.createDataFrame(pairs, "src long, dst long, w long")
    src = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in bellman_ford(e, src, rounds=4).collect()
    }
    # round-synchronous reference (the operator's semantics)
    adj = {}
    for s, d, w in pairs:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {0: 0}
    for _ in range(4):
        nxt = dict(dist)
        for n, dv in dist.items():
            for d, w in adj.get(n, []):
                if dv + w < nxt.get(d, 1 << 60):
                    nxt[d] = dv + w
        dist = nxt
    assert got == dist
    assert got[2] == 2 and 4 not in got and 5 not in got


def test_infer_column_types_rules(spark):
    from postgresimporter_spark.operators.typeinfer import (
        infer_column_types,
    )

    rows = [
        ("1", "1.5", "2020-01-02", "2020-01-02 03:04:05", "true", "x"),
        ("-7", "2e3", "1999-12-31", "2020-01-02T03:04:05.5", "F", ""),
        ("0", "3", None, None, "1", "y"),
    ]
    df = spark.createDataFrame(
        rows, "longs string, doubles string, dates string, "
        "tss string, bools string, texts string"
    )
    out = {r.column: r for r in infer_column_types(df).collect()}
    assert out["longs"].inferred_type == "long"
    # '3' alone is also a long, but '1.5'/'2e3' force double
    assert out["doubles"].inferred_type == "double"
    assert out["dates"].inferred_type == "date"
    assert out["dates"].n_values == 2  # NULL excluded
    assert out["tss"].inferred_type == "timestamp"
    assert out["bools"].inferred_type == "bool"
    assert out["texts"].inferred_type == "text"
    assert out["texts"].n_values == 2  # '' excluded
    # precedence: every long also matches the double rule
    assert out["longs"].n_double == out["longs"].n_values


def test_schema_drift_statuses(spark):
    """The drift report labels each revision case correctly: price_str
    removed, rate_str added, mixed_str text -> long (pollution fixed
    upstream), everything else unchanged."""
    from postgresimporter_spark.plans.catalog_batch72 import (
        q315_schema_drift,
    )

    rows = {
        r.column: (r.type_a, r.type_b, r.status)
        for r in q315_schema_drift(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows["price_str"] == ("double", None, "removed")
    assert rows["rate_str"] == (None, "double", "added")
    assert rows["mixed_str"] == ("text", "long", "type_changed")
    assert rows["id_str"] == ("long", "long", "unchanged")
    assert rows["ts_str"] == ("timestamp", "timestamp", "unchanged")
