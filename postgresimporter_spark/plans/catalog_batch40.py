"""Batch 40: the SQL entry path, exercised.

q215 runs through ``spark.sql`` with explicit GROUPING SETS — every
other catalog query builds its plan via the DataFrame API (with cube/
rollup covering q70/q13), so this pins (a) the raw-SQL surface of the
engine (temp views + ANSI SQL text, the way a reference user would
port their scripts verbatim) and (b) the GROUPING SETS syntax proper,
whose set list is user-chosen rather than the cube/rollup lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (parity imports)

from ..sources.parquet import load_tables
from .catalog import QueryDef


def q215_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts over the explicit set list ((priority, status),
    (priority), ()) — submitted as SQL TEXT against a temp view, the
    port-your-script-verbatim path. GROUPING_ID disambiguates the
    NULL-vs-aggregated rows exactly as in q70's cube."""
    o = load_tables(spark, sf_dir, ["orders"])
    o["orders"].createOrReplaceTempView("q215_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING_ID(o_orderpriority, o_orderstatus) AS BIGINT)
                 AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM q215_orders
        GROUP BY GROUPING SETS (
          (o_orderpriority, o_orderstatus),
          (o_orderpriority),
          ()
        )
        """
    )


ORACLE_Q215 = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY GROUPING SETS (
  (o_orderpriority, o_orderstatus),
  (o_orderpriority),
  ()
)
"""


def batch40_registry() -> list[QueryDef]:
    return [
        QueryDef("q215_grouping_sets", q215_grouping_sets, ORACLE_Q215,
                 "GROUPING SETS via the raw spark.sql entry path"),
    ]
