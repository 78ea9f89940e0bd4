"""Register the packaged function library for ``spark.sql`` text queries.

The reference installs its functions into the database so user hook SQL
can call them (``main.py:202-208``). Spark equivalent: register each as a
SQL-callable function. The column-expression forms in this package are the
fast path (pure Catalyst, codegen); registration here reuses those same
expressions via the DataFrame-API-to-SQL bridge so hook SQL like
``SELECT strip(name) FROM import_animals`` works unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# SQL-expression bodies equivalent to the Catalyst compositions in
# text.py / timestamps.py, installed as temporary SQL functions —
# Spark >= 3.5 supports CREATE TEMPORARY FUNCTION ... AS expression
# via SQL function syntax (SQL UDF, still Catalyst-planned).
_SQL_FUNCTIONS: dict[str, str] = {
    "strip": (
        "CREATE OR REPLACE TEMPORARY FUNCTION strip(s STRING) RETURNS STRING "
        "RETURN nullif(regexp_replace(s, '(^[\\\\n\\\\r]+)|(\")|([\\\\n\\\\r]+$)', ''), '')"
    ),
}


def register_all(spark: SparkSession) -> None:
    """Install the function library into the session."""
    from . import timestamps as T

    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)

    # Python-bridged registrations for the composite parsers: expose the
    # Catalyst expression builders under their reference names so SQL text
    # can call them. These are implemented as SQL UDFs built from the same
    # regex/make_timestamp expressions (kept in one place via format()).
    # Backslashes in regex patterns must be doubled inside SQL string
    # literals (Spark SQL processes backslash escapes).
    tz_rx_sql = T.RX_TZ_EXTRACT.replace("\\", "\\\\")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION parse_timezone(s STRING) "
        "RETURNS STRING RETURN "
        f"nullif(regexp_extract(s, '{tz_rx_sql}', 1), '')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION parse_date(s STRING) "
        "RETURNS DATE RETURN "
        "CASE WHEN s RLIKE '^(\\\\d\\\\d)-(\\\\w\\\\w\\\\w)-(\\\\d\\\\d)$' THEN "
        "make_date(2000 + cast(regexp_extract(s, '^(\\\\d\\\\d)-(\\\\w\\\\w\\\\w)-(\\\\d\\\\d)$', 3) as int), "
        "cast(nullif(array_position(array('JAN','FEB','MAR','APR','MAY','JUN','JUL','AUG','SEP','OCT','NOV','DEC'), "
        "upper(regexp_extract(s, '^(\\\\d\\\\d)-(\\\\w\\\\w\\\\w)-(\\\\d\\\\d)$', 2))), 0) as int), "
        "cast(regexp_extract(s, '^(\\\\d\\\\d)-(\\\\w\\\\w\\\\w)-(\\\\d\\\\d)$', 1) as int)) END"
    )


__all__ = ["register_all"]
