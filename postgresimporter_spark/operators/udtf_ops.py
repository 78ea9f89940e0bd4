"""Python UDTF (Spark 4 table-function API) and grouped-agg pandas UDF —
the remaining §2.8 extension surfaces.

Both follow the engine's determinism rule: Python-side numerics use
fixed-point integer accumulation, so results are partitioning-independent
and oracle-checkable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="token string, position int", useArrow=True)
class TokenizeUDTF:
    """Lateral table function: one row per whitespace token.

    ``useArrow=True`` plans as ArrowEvalPythonUDTF — batched Arrow
    transfer instead of row-at-a-time pickling (the plan-hygiene test
    forbids BatchEvalPython anywhere in the registry)."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        pos = 0
        for tok in text.strip().split():
            if tok:
                pos += 1
                yield (tok, pos)


@pandas_udf("double")
def fixed_point_mean(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: mean via micro-unit int64 accumulation
    (exact sum, one IEEE division chain — partitioning-independent)."""
    total = int((v * 1_000_000).round().astype("int64").sum())
    return (total / 1_000_000.0) / len(v)


def udtf_token_positions(docs: DataFrame) -> DataFrame:
    """Apply the UDTF laterally: (doc_id, token, position)."""
    docs.createOrReplaceTempView("_udtf_docs")
    spark = docs.sparkSession
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql(
        "SELECT doc_id, t.token, t.position "
        "FROM _udtf_docs, LATERAL tokenize_udtf(text) AS t"
    )


def grouped_fixed_mean(
    df: DataFrame, key: str, value: str, out_name: str = "mean_value"
) -> DataFrame:
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregate
    # functions (INVALID_PANDAS_UDF_PLACEMENT) — two aggs, one join
    means = df.groupBy(key).agg(
        fixed_point_mean(F.col(value)).alias(out_name)
    )
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    return means.join(counts, on=key)


__all__ = [
    "TokenizeUDTF",
    "fixed_point_mean",
    "udtf_token_positions",
    "grouped_fixed_mean",
]
