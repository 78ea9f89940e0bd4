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
    spark.sql(_parse_date_sql())
    spark.sql(_parse_timestamp_sql())


def _sqlrx(rx: str) -> str:
    """Regex -> SQL string literal body (double the backslashes)."""
    return rx.replace("\\", "\\\\")


_MONTH_ARRAY = (
    "array('JAN','FEB','MAR','APR','MAY','JUN',"
    "'JUL','AUG','SEP','OCT','NOV','DEC')"
)


def _yy_sql(yy: str) -> str:
    return (
        f"CASE WHEN try_cast({yy} AS INT) < 70 "
        f"THEN try_cast({yy} AS INT) + 2000 "
        f"ELSE try_cast({yy} AS INT) + 1900 END"
    )


def _fields_ts_sql(tz_sql: str) -> str:
    """SQL form of timestamps._oracle_fields_ts (same capture groups)."""
    from . import timestamps as T

    rx = _sqlrx(T._RX_FIELDS)
    g = lambda i: f"regexp_extract(s, '{rx}', {i})"  # noqa: E731
    month = (
        f"cast(nullif(array_position({_MONTH_ARRAY}, upper({g(2)})), 0) AS INT)"
    )
    hour24 = (
        f"CASE WHEN {g(8)} = 'PM' THEN try_cast({g(4)} AS INT) % 12 + 12 "
        f"ELSE try_cast({g(4)} AS INT) % 12 END"
    )
    secs = (
        f"try_cast({g(6)} AS DOUBLE) + "
        f"coalesce(try_cast(substring({g(7)}, 1, 6) AS DOUBLE) / 1e6, 0.0)"
    )
    return (
        f"make_timestamp({_yy_sql(g(3))}, {month}, try_cast({g(1)} AS INT), "
        f"{hour24}, try_cast({g(5)} AS INT), {secs}, {tz_sql})"
    )


def _parse_date_sql() -> str:
    rx = "^(\\\\d\\\\d)-(\\\\w\\\\w\\\\w)-(\\\\d\\\\d)$"
    g = lambda i: f"regexp_extract(s, '{rx}', {i})"  # noqa: E731
    month = (
        f"cast(nullif(array_position({_MONTH_ARRAY}, upper({g(2)})), 0) AS INT)"
    )
    return (
        "CREATE OR REPLACE TEMPORARY FUNCTION parse_date(s STRING) "
        "RETURNS DATE RETURN "
        f"CASE WHEN s RLIKE '{rx}' THEN "
        f"make_date({_yy_sql(g(3))}, {month}, try_cast({g(1)} AS INT)) END"
    )


def _parse_timestamp_sql() -> str:
    """SQL form of the 5-format parse_timestamp CASE (timestamps.py)."""
    from . import timestamps as T

    offset_tz = "regexp_extract(s, '((\\\\+|-)\\\\d\\\\d:\\\\d\\\\d)$', 1)"
    named_tz = f"nullif(regexp_extract(s, '{_sqlrx(T.RX_TZ_EXTRACT)}', 1), '')"
    crx = _sqlrx(T._RX_COMPACT_FIELDS)
    gc = lambda i: f"regexp_extract(s, '{crx}', {i})"  # noqa: E731
    compact = (
        f"make_timestamp(try_cast({gc(1)} AS INT), try_cast({gc(2)} AS INT), "
        f"try_cast({gc(3)} AS INT), try_cast({gc(4)} AS INT), "
        f"try_cast({gc(5)} AS INT), try_cast({gc(6)} AS DOUBLE), "
        f"concat({gc(7)}, ':', {gc(8)}))"
    )
    return (
        "CREATE OR REPLACE TEMPORARY FUNCTION parse_timestamp(s STRING) "
        "RETURNS TIMESTAMP RETURN CASE "
        f"WHEN s RLIKE '{_sqlrx(T.RX_FRAC_OFFSET)}' THEN {_fields_ts_sql(offset_tz)} "
        f"WHEN s RLIKE '{_sqlrx(T.RX_OFFSET)}' THEN {_fields_ts_sql(offset_tz)} "
        f"WHEN s RLIKE '{_sqlrx(T.RX_FRAC_ZONE)}' THEN {_fields_ts_sql(named_tz)} "
        f"WHEN s RLIKE '{_sqlrx(T.RX_ZONE)}' THEN {_fields_ts_sql(named_tz)} "
        f"WHEN s RLIKE '{_sqlrx(T.RX_COMPACT)}' THEN {compact} "
        "END"
    )


__all__ = ["register_all"]
