"""Batch 72: schema drift audit between ingest snapshots.

q315 is the governance step after a re-ingest: compare two all-text
snapshots of "the same" feed column-by-column — which columns
appeared, disappeared, or changed their INFERRED type (the q309
syntax rules; an all-text load carries no declared types, so inferred
type IS the schema). Snapshot A is the q309 projection of orders;
snapshot B deterministically simulates a feed revision: one column
dropped, one added, one whose values drift from pure integers to
decimals, the rest unchanged. One full-outer join of two O(columns)
inference outputs — trivially 100 TB-safe, the scans stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef


def _snapshot_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return o.select(
        F.col("o_orderkey").cast("string").alias("id_str"),
        # price_str drops out (removed column)
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("bool_str"),
        # mixed_str's 'n/a' pollution is fixed upstream -> becomes long
        F.col("o_orderkey").cast("string").alias("mixed_str"),
        F.col("o_orderpriority").alias("text_str"),
        # new column in the revised feed
        F.format_string("%.1f", F.col("o_totalprice") / 100).alias(
            "rate_str"
        ),
    )


def q315_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level drift report between the q309 snapshot (A) and the
    revised feed (B): (column, type_a, type_b, status)."""
    from ..operators.typeinfer import infer_column_types
    from .catalog_batch67 import q309_type_inference

    a = q309_type_inference(spark, sf_dir).select(
        "column", F.col("inferred_type").alias("type_a")
    )
    b = infer_column_types(_snapshot_b(spark, sf_dir)).select(
        "column", F.col("inferred_type").alias("type_b")
    )
    status = (
        F.when(F.col("type_a").isNull(), F.lit("added"))
        .when(F.col("type_b").isNull(), F.lit("removed"))
        .when(F.col("type_a") != F.col("type_b"), F.lit("type_changed"))
        .otherwise(F.lit("unchanged"))
    )
    return a.join(b, on="column", how="full_outer").select(
        "column", "type_a", "type_b", status.alias("status")
    )


def _drift_oracle() -> str:
    from .catalog_batch67 import _ti_oracle
    from ..operators.typeinfer import TYPE_RULES

    cols_b = {
        "id_str": "CAST(o_orderkey AS VARCHAR)",
        "date_str": "strftime(o_orderdate, '%Y-%m-%d')",
        "ts_str": "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
        "bool_str": "CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END",
        "mixed_str": "CAST(o_orderkey AS VARCHAR)",
        "text_str": "o_orderpriority",
        "rate_str": "printf('%.1f', o_totalprice / 100)",
    }
    unions = "\nUNION ALL ".join(
        f"SELECT '{name}' AS \"column\", {expr} AS v FROM orders"
        for name, expr in cols_b.items()
    )
    match_aggs = ",\n".join(
        "CAST(SUM(CASE WHEN present AND regexp_matches(v, '"
        + rx.replace("'", "''")
        + f"') THEN 1 ELSE 0 END) AS BIGINT) AS n_{name}"
        for name, rx in TYPE_RULES
    )
    cases = " ".join(
        f"WHEN n_values > 0 AND n_{name} = n_values THEN '{name}'"
        for name, _ in TYPE_RULES
    )
    inferred = f"CASE {cases} ELSE 'text' END"
    return f"""
WITH a AS (SELECT "column", inferred_type AS type_a FROM ({_ti_oracle()})),
bstacked AS ({unions}),
bflagged AS (
  SELECT "column", v, v IS NOT NULL AND v <> '' AS present FROM bstacked),
bcounted AS (
  SELECT "column",
    CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_values,
    {match_aggs}
  FROM bflagged GROUP BY "column"),
b AS (SELECT "column", {inferred} AS type_b FROM bcounted)
SELECT COALESCE(a."column", b."column") AS "column", type_a, type_b,
       CASE WHEN type_a IS NULL THEN 'added'
            WHEN type_b IS NULL THEN 'removed'
            WHEN type_a <> type_b THEN 'type_changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a."column" = b."column"
"""


def batch72_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q315_schema_drift",
            q315_schema_drift,
            _drift_oracle(),
            "inferred-type schema drift between all-text snapshots",
        ),
    ]
