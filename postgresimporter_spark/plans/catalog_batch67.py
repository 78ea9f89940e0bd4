"""Batch 67: weighted shortest paths and all-text type inference.

- q308 Bellman-Ford — ``graph.bellman_ford``: single-source shortest
  paths over the co-purchase graph with deterministic integer weights
  ((src+dst) % 7 + 1), five relaxation rounds, all arithmetic BIGINT.
  Each round is one frontier⋈edges equi-join + min-groupBy — the
  weighted cousin of the q243 BFS / q119 PageRank Pregel-as-joins
  shape. The oracle replays the identical five rounds as chained CTEs.
- q309 type inference — ``typeinfer.infer_column_types``: the typing
  step after the reference's all-text bulk load (reference main.py
  loads every CSV column as TEXT via pgfutter and leaves typing to
  post-load SQL). Applied to a deterministically-formatted all-text
  projection of orders: pure-integer, fixed-point, date, timestamp,
  boolean, 90%-integer ('n/a'-polluted -> text) and free-text
  columns; syntax-rule counts and the inferred type per column, with
  the oracle replaying the same anchored regexes over an UNPIVOT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_tables
from .catalog import QueryDef

# q308: Bellman-Ford SSSP --------------------------------------------------------

BF_ROUNDS = 5
_W_SQL = "(src + dst) % 7 + 1"


def q308_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest distances from the smallest co-purchase node under
    deterministic integer edge weights, after 5 relaxation rounds."""
    from ..operators.graph import bellman_ford
    from .catalog_batch18 import _edges

    e = _edges(spark, sf_dir).select(
        "src",
        "dst",
        ((F.col("src") + F.col("dst")) % 7 + 1).cast("long").alias("w"),
    )
    source = e.agg(F.min("src").alias("node"))
    return bellman_ford(e, source, rounds=BF_ROUNDS).select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("dist"),
    )


def _bf_oracle() -> str:
    from .catalog_batch18 import _EDGES_SQL

    steps = []
    for t in range(1, BF_ROUNDS + 1):
        steps.append(
            f"""d{t} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{t - 1}
    UNION ALL
    SELECT e.dst AS node, d{t - 1}.dist + e.w AS dist
    FROM d{t - 1} JOIN sym e ON d{t - 1}.node = e.src) r
  GROUP BY node)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src, dst, {_W_SQL} AS w FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst, {_W_SQL} AS w FROM edges),
d0 AS (SELECT MIN(src) AS node, 0 AS dist FROM sym),
{steps_sql}
SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
FROM d{BF_ROUNDS}
"""


# q309: all-text type inference --------------------------------------------------


def q309_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntax-rule type inference over a deterministically-formatted
    all-text projection of orders (the post-bulk-load typing step)."""
    from ..operators.typeinfer import infer_column_types

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    text = o.select(
        F.col("o_orderkey").cast("string").alias("id_str"),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("bool_str"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("n/a"))
        .otherwise(F.col("o_orderkey").cast("string"))
        .alias("mixed_str"),
        F.col("o_orderpriority").alias("text_str"),
    )
    return infer_column_types(text)


def _ti_oracle() -> str:
    from ..operators.typeinfer import TYPE_RULES

    cols = {
        "id_str": "CAST(o_orderkey AS VARCHAR)",
        "price_str": "printf('%.2f', o_totalprice)",
        "date_str": "strftime(o_orderdate, '%Y-%m-%d')",
        "ts_str": "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
        "bool_str": "CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END",
        "mixed_str": "CASE WHEN o_orderkey % 10 = 0 THEN 'n/a'"
        " ELSE CAST(o_orderkey AS VARCHAR) END",
        "text_str": "o_orderpriority",
    }
    unions = "\nUNION ALL ".join(
        f"SELECT '{name}' AS \"column\", {expr} AS v FROM orders"
        for name, expr in cols.items()
    )
    # DuckDB single-quoted strings are standard-conforming (no
    # backslash escapes): pass the regex source through verbatim
    match_aggs = ",\n".join(
        "CAST(SUM(CASE WHEN present AND regexp_matches(v, '"
        + rx.replace("'", "''")
        + f"') THEN 1 ELSE 0 END) AS BIGINT) AS n_{name}"
        for name, rx in TYPE_RULES
    )
    cases = []
    for name, _ in TYPE_RULES:
        cases.append(
            f"WHEN n_values > 0 AND n_{name} = n_values THEN '{name}'"
        )
    inferred = "CASE " + " ".join(cases) + " ELSE 'text' END"
    return f"""
WITH stacked AS ({unions}),
flagged AS (
  SELECT "column", v, v IS NOT NULL AND v <> '' AS present FROM stacked),
counted AS (
  SELECT "column",
    CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_values,
    {match_aggs}
  FROM flagged GROUP BY "column")
SELECT "column", n_values, n_long, n_double, n_timestamp, n_date,
       n_bool, {inferred} AS inferred_type
FROM counted
"""


def batch67_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q308_bellman_ford",
            q308_bellman_ford,
            _bf_oracle(),
            "5-round weighted SSSP vs chained-CTE relaxation replay",
        ),
        QueryDef(
            "q309_type_inference",
            q309_type_inference,
            _ti_oracle(),
            "all-text syntax-rule type inference vs SQL regex replay",
        ),
    ]
