"""Plan audit: the engine's scale invariants as a queryable library
API, not just a test-suite lint.

``plan_audit(df)`` summarizes a DataFrame's physical plan into the
counters that decide whether a query survives a 100x scale-up — the
same signals ``tests/test_plan_hygiene.py`` enforces over the whole
registry, exposed so users (and CI gates on THEIR queries) can assert
them directly:

    audit = plan_audit(df)
    assert audit["n_rowwise_python"] == 0
    assert not audit["unpartitioned_windows"]
    assert audit["n_cartesian"] == 0

Heuristics operate on the executed-plan string (stable across Spark 3/4
for these operator names); building the plan triggers analysis +
optimization but executes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_windows(plan: str) -> list[str]:
    """Window operator lines with an empty partition spec — the
    one-reducer global sort. A partitioned Window prints three bracket
    groups ``Window [funcs], [part], [order]``; unpartitioned two."""
    return [
        line
        for line in plan.splitlines()
        if "Window [" in line and line.count("], [") < 2
    ]


def plan_audit(df: DataFrame) -> dict:
    """Scale-signal summary of ``df``'s physical plan. Keys:

    - ``n_exchanges``: shuffle exchanges (each is a full network pass)
    - ``n_broadcast_joins`` / ``n_sortmerge_joins``: join strategy mix
    - ``n_cartesian``: CartesianProduct + BroadcastNestedLoopJoin
      (all-pairs shapes; should be 0 unless one side is a literal
      handful of rows)
    - ``n_rowwise_python``: BatchEvalPython operators (pickled
      row-at-a-time UDFs; the sanctioned Python surfaces are Arrow:
      ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    - ``n_arrow_python``: Arrow-batched Python operators
    - ``unpartitioned_windows``: offending plan lines (global sorts)
    - ``n_scans_with_pushdown`` / ``n_scans``: parquet scans carrying
      PushedFilters vs. all file scans
    - ``n_wholestage``: whole-stage-codegen spans (wider = better)
    """
    plan = physical_plan(df)
    lines = plan.splitlines()

    def count(token: str) -> int:
        return sum(1 for ln in lines if token in ln)

    return {
        "n_exchanges": count("Exchange "),
        "n_broadcast_joins": count("BroadcastHashJoin"),
        "n_sortmerge_joins": count("SortMergeJoin"),
        "n_cartesian": count("CartesianProduct")
        + count("BroadcastNestedLoopJoin"),
        "n_rowwise_python": count("BatchEvalPython"),
        "n_arrow_python": count("ArrowEvalPython")
        + count("MapInPandas")
        + count("FlatMapGroupsInPandas"),
        "unpartitioned_windows": unpartitioned_windows(plan),
        "n_scans": count("FileScan"),
        "n_scans_with_pushdown": sum(
            1
            for ln in lines
            if "FileScan" in ln and "PushedFilters: [" in ln
            and "PushedFilters: []" not in ln
        ),
        "n_wholestage": count("WholeStageCodegen"),
    }


__all__ = ["physical_plan", "plan_audit", "unpartitioned_windows"]


def scan_details(df: DataFrame) -> list[dict]:
    """Column-level source lineage from the physical plan: one entry
    per file scan with the pruned read schema and the filters pushed
    into it — "which source columns does this query actually touch",
    the question a governance review or an access audit asks, answered
    from the OPTIMIZED plan (so projection pruning is reflected, not
    the query text's SELECT list).

    Each entry: {"location": str, "columns": [str], "pushed_filters":
    [str], "format": str}. Heuristic string parse of the FileScan
    node (stable across Spark 3/4); building the plan executes nothing.
    """
    import re

    plan = physical_plan(df)
    out: list[dict] = []
    for m in re.finditer(r"FileScan (\w+) \[[^\]]*\]", plan):
        # the full node line holds Location / PushedFilters / ReadSchema
        line_start = plan.rfind("\n", 0, m.start()) + 1
        line_end = plan.find("\n", m.end())
        node = plan[line_start : line_end if line_end > 0 else None]
        loc = re.search(r"Location: [^\[]*\[([^\]]*)\]", node)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", node)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", node)
        cols = []
        if schema:
            cols = [
                c.split(":")[0].strip()
                for c in schema.group(1).split(",")
                if c.strip()
            ]
        out.append(
            {
                "format": m.group(1),
                "location": loc.group(1) if loc else "",
                "columns": cols,
                "pushed_filters": (
                    [f.strip() for f in pushed.group(1).split(",") if f.strip()]
                    if pushed
                    else []
                ),
            }
        )
    return out


__all__.append("scan_details")
