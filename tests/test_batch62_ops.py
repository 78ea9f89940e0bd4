"""Batch-62: row-level naming parity vs the driver-side reference
implementation, and pointer jumping vs a sequential Python walk."""

from __future__ import annotations

import pytest

from postgresimporter_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_q296_row_level_equals_driver_side(spark, reg):
    """The Catalyst column chain must reproduce the driver-side
    ``naming.to_filename`` (the reference contract) on every fixture
    input — the documented approximation domain (ASCII + lowercase
    German umlauts)."""
    from postgresimporter_spark.naming import table_name_for_path, to_filename

    rows = reg["q296_naming_parity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.filename == to_filename(r.dirty), r.dirty
        assert r.table_name == table_name_for_path(
            f"/data/{r.dirty}_{r.c_custkey % 3}.csv"
        ), r.dirty
    # the reference goldens themselves (tests/test_load.py:38-71)
    assert to_filename("running_jan19") == "running_jan19"
    assert table_name_for_path("/x/running_jan19.csv") == "running"
    assert table_name_for_path("/x/example.test.csv") == "example"


def test_q297_matches_sequential_walk(spark, reg):
    got = {
        r.doc_id: (r.root_id, r.depth)
        for r in reg["q297_redirect_chains"].fn(spark, SF).collect()
    }
    assert got
    for doc in got:
        cur, d = doc, 0
        while cur % 7 != 0:
            cur, d = cur - 1, d + 1
        assert got[doc] == (cur, d), doc
    assert max(d for _, d in got.values()) == 6  # chains really go deep


def test_pointer_jump_partial_depth_contract(spark):
    """With too few rounds the operator resolves to the 2^rounds-th
    ancestor (documented partial contract), never loses rows."""
    from postgresimporter_spark.operators.graph import pointer_jump_roots

    parents = spark.createDataFrame(
        [(i, max(i - 1, 0)) for i in range(6)], "node long, parent long"
    )
    one = {
        r.node: (r.root, r.depth)
        for r in pointer_jump_roots(parents, rounds=1).collect()
    }
    assert one[5] == (3, 2)  # 2^1 ancestors resolved
    full = {
        r.node: (r.root, r.depth)
        for r in pointer_jump_roots(parents, rounds=3).collect()
    }
    assert full[5] == (0, 5)


def test_q298_walks_match_python_model(spark, reg):
    """Replicate the hash-seeded walk sequentially in Python over the
    collected (metadata-scale at sf0.001) edge list."""
    import hashlib

    from postgresimporter_spark.operators.graph import random_walks
    from postgresimporter_spark.plans.catalog_batch18 import _edges

    e = [(r.src, r.dst) for r in _edges(spark, SF).collect()]
    adj = {}
    for s, d in e:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)

    def score(wid, t, dst):
        h = hashlib.md5(f"walk:{wid}:{t}:{dst}".encode()).hexdigest()
        return int(h[:15], 16)

    want = set()
    for start in adj:
        cur = start
        want.add((start, 0, start))
        for t in range(1, 5):
            cur = min(adj[cur], key=lambda d: (score(start, t, d), d))
            want.add((start, t, cur))
    got = {
        (r.walk_id, r.step, r.node)
        for r in random_walks(_edges(spark, SF), length=4).collect()
    }
    assert got == want
