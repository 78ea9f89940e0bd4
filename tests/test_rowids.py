"""Global row-id assignment: dense, order-correct, layout-independent,
and window-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.operators.rowids import assign_global_ids
from postgresimporter_spark.sources.parquet import load_tables

SF = "/root/testdata/sf0.001"


def test_ids_are_dense_and_order_correct(spark):
    docs = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "source"
    )
    out = assign_global_ids(docs, ["source", "doc_id"], num_partitions=8)
    rows = out.orderBy("row_id").collect()
    assert [r.row_id for r in rows] == list(range(len(rows)))
    keys = [(r.source, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_ids_independent_of_input_partitioning(spark):
    docs = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "source"
    )
    a = {
        r.doc_id: r.row_id
        for r in assign_global_ids(
            docs, ["source", "doc_id"], num_partitions=8
        ).collect()
    }
    b = {
        r.doc_id: r.row_id
        for r in assign_global_ids(
            docs.repartition(17), ["source", "doc_id"], num_partitions=3
        ).collect()
    }
    assert a == b


def test_no_unpartitioned_window_in_plan(spark):
    docs = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "source"
    )
    out = assign_global_ids(docs, ["source", "doc_id"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
