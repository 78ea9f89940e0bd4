"""Text scalar functions (reference ``hooks/functions.sql:1-13``)."""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# strip(): remove leading/trailing CR/LF runs and every '"', then
# empty-string -> NULL. Reference hooks/functions.sql:1-5:
#   NULLIF(regexp_replace($1, E'(^[\n\r]+)|(")|([\n\r]+$)', '', 'g'), '')
STRIP_PATTERN = r'(^[\n\r]+)|(")|([\n\r]+$)'


def strip_col(col: Column | str) -> Column:
    """``strip(text) -> TEXT`` as a codegen-friendly expression.

    NULL-in -> NULL-out comes free (regexp_replace propagates null),
    matching the reference's RETURNS NULL ON NULL INPUT.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_replace(c, STRIP_PATTERN, ""), F.lit(""))


def collect_json(df) -> str:
    """``json_agg``-equivalent result fetch (reference exec.py:110 wraps
    inline commands as ``SELECT json_agg(query) FROM (<cmd>) query``).

    One aggregated row: the full result set as a JSON array string.
    Driver-side by construction (it is the IPC fetch path, not an
    operator) — use only on small/final results.
    """
    from pyspark.sql import functions as F

    row = df.agg(
        F.to_json(F.collect_list(F.struct(*df.columns))).alias("j")
    ).collect()[0]
    return row.j or "[]"


def has_column(spark: SparkSession, table: str, column: str) -> bool:
    """``has_column(schema, table, col)`` — catalog existence probe.

    Reference ``hooks/functions.sql:7-13`` queries
    ``information_schema.columns``; Spark's catalog is the equivalent.
    Temp views have no schema namespace, so the reference's first
    argument folds into the view name (see ``naming.import_view_name``).
    """
    try:
        return column in [f.name for f in spark.table(table).schema.fields]
    except Exception:
        return False
