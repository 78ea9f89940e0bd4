"""Embedding quantization: float32 -> int8 with per-vector scale.

The standard storage/bandwidth trade for 100 TB embedding corpora:
int8 + one float scale per vector is ~4x smaller, and the dequantized
cosine stays within ~1% of exact. Quantization is a pure projection
(no shuffle); everything is expressible with array lambdas so it stays
in codegen and is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    return F.array_max(
        F.transform(vec, lambda x: F.abs(x.cast("double")))
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``qvec`` (int8-range ints) and ``scale`` columns.

    q_i = round(x_i / scale) with scale = max|x| / 127; zero vectors
    quantize to all-zero with scale 0.
    """
    vec = F.col(vec_col)
    scale = _max_abs(vec) / F.lit(127.0)
    qvec = F.when(scale == 0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(
            vec,
            lambda x: F.round(x.cast("double") / scale).cast("int"),
        )
    )
    return df.withColumn("scale", scale).withColumn("qvec", qvec)


def dequantized_cosine(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Cosine over dequantized vectors (scales cancel in the ratio, so
    this is exactly the cosine of the integer vectors)."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda q: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(q, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (norm(qa) * norm(qb))


__all__ = ["quantize_embeddings", "dequantized_cosine"]
