"""Bucketed co-located join: verifies the shuffle is actually removed
from the physical plan, and results match the plain-join equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresimporter_spark.operators.bucketing import (
    bucketed_join,
    count_exchanges,
    write_bucketed,
)
from postgresimporter_spark.sources.parquet import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    t = load_tables(spark, SF, ["orders", "lineitem"])
    # disable auto-broadcast so the join strategy under test is SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # external under tmp: a session killed before teardown can't leave a
    # stale warehouse location behind (LOCATION_ALREADY_EXISTS on rerun)
    base = tmp_path_factory.mktemp("bkt")
    write_bucketed(
        t["orders"].withColumnRenamed("o_orderkey", "orderkey"),
        "bkt_orders",
        ["orderkey"],
        num_buckets=8,
        path=str(base / "bkt_orders"),
    )
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "orderkey"),
        "bkt_lineitem",
        ["orderkey"],
        num_buckets=8,
        path=str(base / "bkt_lineitem"),
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = bucketed_join(
        spark, "bkt_orders", "bkt_lineitem", on=["orderkey"]
    )
    agg = joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )
    # join itself: zero exchanges (both sides pre-bucketed on the key)
    assert count_exchanges(joined) == 0
    # the aggregation adds exactly the one exchange it needs
    assert count_exchanges(agg) <= 1

    # results identical to the plain join
    t = load_tables(spark, SF, ["orders", "lineitem"])
    expected = {
        (r.o_orderpriority, r.n)
        for r in t["orders"]
        .join(
            t["lineitem"],
            t["orders"].o_orderkey == t["lineitem"].l_orderkey,
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {(r.o_orderpriority, r.n) for r in agg.collect()}
    assert got == expected


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join over plain tables needs exchanges."""
    t = load_tables(spark, SF, ["orders", "lineitem"])
    joined = t["orders"].join(
        t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey
    )
    assert count_exchanges(joined) >= 2
