"""Column type inference for all-text tables — the typing step a
reference user performs after the all-text bulk load (the reference
imports every CSV column as TEXT — ``/root/reference/
postgresimporter/main.py:491-542`` via pgfutter — and leaves typing
to post-load SQL; this operator derives that SQL's CAST targets from
the data).

Inference is SYNTAX-based (documented regex rules, below), not
``try_cast``-based: engines disagree on cast edge cases ('1.5' to
BIGINT truncates in some, nulls in others), while anchored regex
matching is bit-identical everywhere — which keeps the operator
differentially testable and its verdicts engine-portable. A column
gets a type only when EVERY non-null, non-empty value matches that
type's rule; precedence long > double > timestamp > date > bool >
text (long before double because every long literal is also a valid
double literal).

Scale: one melt (each row expands to one struct per column — map-side
only, no shuffle) and ONE aggregate over (column) keys; state is
O(columns), the whole-table scan streams. The 100 TB practice is to
run it on a deterministic sample partition first and confirm on the
full scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, anchored regex) in PRECEDENCE order; applied to the exact
# string value (no trim — whitespace is data in an all-text load)
TYPE_RULES: tuple[tuple[str, str], ...] = (
    ("long", r"^-?\d+$"),
    ("double", r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"),
    ("timestamp", r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    # flag group leads the pattern: Java and RE2 accept (?i) anywhere,
    # Python's re only at position 0 — leading keeps the rule portable
    # to every engine that might replay it
    ("bool", r"(?i)^(true|false|t|f|0|1)$"),
)


def infer_column_types(df: DataFrame) -> DataFrame:
    """Per-column match counts and the inferred type for an all-text
    DataFrame. Returns (column, n_values, n_long, n_double,
    n_timestamp, n_date, n_bool, inferred_type); ``n_values`` counts
    non-null, non-empty strings, and a column with no values infers
    'text'."""
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in df.columns
                ]
            )
        ).alias("s")
    ).select("s.column", "s.v")
    present = F.col("v").isNotNull() & (F.col("v") != "")
    aggs = [
        F.sum(F.when(present, 1).otherwise(0)).cast("long").alias("n_values")
    ]
    for name, rx in TYPE_RULES:
        aggs.append(
            F.sum(F.when(present & F.col("v").rlike(rx), 1).otherwise(0))
            .cast("long")
            .alias(f"n_{name}")
        )
    counted = stacked.groupBy("column").agg(*aggs)
    inferred = F.lit("text")
    for name, _ in reversed(TYPE_RULES):
        inferred = F.when(
            (F.col("n_values") > 0)
            & (F.col(f"n_{name}") == F.col("n_values")),
            F.lit(name),
        ).otherwise(inferred)
    return counted.select(
        "column",
        "n_values",
        *[f"n_{name}" for name, _ in TYPE_RULES],
        inferred.alias("inferred_type"),
    )


__all__ = ["TYPE_RULES", "infer_column_types"]
