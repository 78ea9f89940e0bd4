"""ORC source round-trip + pushdown, and HLL sketch properties.

Neither surface has a DuckDB oracle (ORC is format plumbing; sketches
are approximate), so contract tests carry the correctness burden:
round-trip equality, plan-level pushdown, estimates inside the HLL
error envelope, and merge-associativity of stored sketches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.operators import sketches as SK
from postgresimporter_spark.sources.orc import read_orc, write_orc
from postgresimporter_spark.sources.parquet import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip_exact(spark, tmp_path):
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    # value-level: anti-join both ways is empty
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0


def test_orc_partitioned_write_prunes(spark, tmp_path):
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    path = str(tmp_path / "orders_part")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes at planning time; no row-level filter on
    # the partition column survives into the scan's data filters
    assert "PartitionFilters" in plan
    exact = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == exact


def test_orc_predicate_pushdown_in_plan(spark, tmp_path):
    li = load_tables(spark, SF_DIR, ["lineitem"])["lineitem"]
    path = str(tmp_path / "li_orc")
    write_orc(li.select("l_orderkey", "l_quantity", "l_shipdate"), path)
    q = read_orc(spark, path).where(F.col("l_quantity") < 10).select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan
    # column pruning: shipdate never read
    assert "l_shipdate" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_hll_estimate_within_envelope(spark):
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    exact = orders.select("o_custkey").distinct().count()
    est = (
        SK.distinct_sketch(orders, [], "o_custkey")
        .collect()[0]["n_distinct_est"]
    )
    # lgK=12 -> ~1.6% RSE; allow 5 sigma
    assert abs(est - exact) / exact < 0.08


def test_hll_rollup_matches_direct_union(spark):
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    per_status = SK.distinct_sketch(orders, ["o_orderstatus"], "o_custkey")
    assert per_status.count() == 3
    merged = SK.rollup_sketches(per_status, []).collect()[0]["n_distinct_est"]
    direct = (
        SK.distinct_sketch(orders, [], "o_custkey")
        .collect()[0]["n_distinct_est"]
    )
    # merging per-group sketches must equal sketching the whole column:
    # HLL union is lossless over the same lgK
    assert merged == direct


def test_approx_distinct_grouped(spark):
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    got = {
        r.o_orderstatus: r.n_distinct_est
        for r in SK.approx_distinct(orders, ["o_orderstatus"], "o_custkey").collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(got[k] - v) / v < 0.08
