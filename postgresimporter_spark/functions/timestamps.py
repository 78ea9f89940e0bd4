"""Timestamp/date parsing functions (reference ``hooks/functions.sql:24-63``).

The reference ships a ``parse_timestamp(text)`` CASE over five
regex-detected Oracle-dump formats:

1. ``31-JAN-19 03.20.00.000000000 PM +01:00``  (9-digit frac + offset)
2. ``31-JAN-19 03.20.00 PM +01:00``            (offset)
3. ``28-MAR-19 05.02.10.000000000 AM GMT``     (9-digit frac + named zone)
4. ``28-MAR-19 05.02.10 AM GMT``               (named zone)
5. ``20190101013449+0000``                     (compact)

plus ``parse_date('01-FEB-19')``. Everything else (and NULL) -> NULL.

Implementation note: Java ``DateTimeFormatter`` (behind ``F.to_timestamp``)
is case-sensitive for month names (``JAN`` fails where ``Jan`` parses) and
Spark timestamps are microsecond-precision, so instead of fighting format
patterns we extract fields with ``regexp_extract`` and assemble with
``make_timestamp`` — pure Catalyst expressions, whole-stage codegen, no
Python UDFs, deterministic across JVM locales.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference detection regexes (hooks/functions.sql:39-57), used verbatim
# for format dispatch. NB: the reference uses unescaped '.' separators in
# its patterns; we keep that lenient behavior for parity.
RX_FRAC_OFFSET = r"\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.\d{9} (AM|PM) (\+|-)\d\d:\d\d"
RX_OFFSET = r"\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d (AM|PM) (\+|-)\d\d:\d\d"
RX_FRAC_ZONE = r"\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.\d{9} (AM|PM) (\w\w\w)"
RX_ZONE = r"\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d (AM|PM) (\w\w\w)"
RX_COMPACT = r"\d{14}(\+|-)\d{4}"
# parse_timezone() extraction pattern (hooks/functions.sql:31-36).
RX_TZ_EXTRACT = r"\d\d-\w\w\w-\d\d \d\d.\d\d.\d\d.?\d{0,9} (?:AM|PM) (\w\w\w)"

# Capture-group form used for field extraction (Oracle dd-MON-yy clock).
_RX_FIELDS = (
    r"(\d\d)-(\w\w\w)-(\d\d) (\d\d)\.(\d\d)\.(\d\d)(?:\.(\d{9}))? (AM|PM) (.*)"
)
_RX_COMPACT_FIELDS = r"(\d{4})(\d\d)(\d\d)(\d\d)(\d\d)(\d\d)((?:\+|-)\d\d)(\d\d)"

_MONTHS = [
    "JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC",
]


def _month_num(mon: Column) -> Column:
    """3-letter uppercase month name -> 1..12 (null if unknown)."""
    return F.nullif(
        F.array_position(
            F.array(*[F.lit(m) for m in _MONTHS]), F.upper(mon)
        ),
        F.lit(0),
    ).cast("int")


def _yy_to_year(yy: Column) -> Column:
    """Two-digit year -> full year, Postgres rounding semantics:
    values < 70 become 20xx, >= 70 become 19xx (nearest-century rule)."""
    y = yy.try_cast("int")
    return F.when(y < 70, y + 2000).otherwise(y + 1900).cast("int")


def _hour24(hh12: Column, ampm: Column) -> Column:
    h = hh12.try_cast("int") % 12
    return F.when(ampm == "PM", h + 12).otherwise(h)


def _oracle_fields_ts(c: Column, tz: Column) -> Column:
    """Assemble a timestamp from the dd-MON-yy capture groups of ``c``,
    interpreting wall-clock fields in time zone ``tz`` (offset or name).
    ``make_timestamp``'s timezone argument accepts both ``+01:00`` and
    zone names like ``GMT``; the result is the instant in session time
    (UTC for this engine — session.py pins spark.sql.session.timeZone)."""
    g = lambda i: F.regexp_extract(c, _RX_FIELDS, i)  # noqa: E731
    # 9 fractional digits or ''; truncate (not round) to Spark's
    # microsecond timestamp precision.
    micros = F.substring(g(7), 1, 6)
    secs = (
        g(6).try_cast("double")
        + F.coalesce(micros.try_cast("double") / 1e6, F.lit(0.0))
    )
    return F.make_timestamp(
        _yy_to_year(g(3)),
        _month_num(g(2)),
        g(1).try_cast("int"),
        _hour24(g(4), g(8)),
        g(5).try_cast("int"),
        secs,
        tz,
    )


def parse_timezone_col(col: Column | str) -> Column:
    """``parse_timezone(text) -> TEXT`` — extract a 3-letter zone name.

    Reference ``hooks/functions.sql:31-36``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c, RX_TZ_EXTRACT, 1), F.lit(""))


def parse_timestamp_with_tz_col(col: Column | str, tz: Column | str) -> Column:
    """``parse_timestamp_with_tz(text, fmt, tz)`` — parse wall-clock text
    then interpret it in ``tz`` and convert to session time.

    Reference ``hooks/functions.sql:24-29``. The reference threads a
    Postgres format string; this engine's formats are fixed by the
    dispatch regexes, so the ``fmt`` argument is subsumed and only the
    zone is taken.
    """
    c = F.col(col) if isinstance(col, str) else col
    z = F.lit(tz) if isinstance(tz, str) else tz
    return _oracle_fields_ts(c, z)


def parse_timestamp_col(col: Column | str) -> Column:
    """``parse_timestamp(text) -> TIMESTAMP`` — the 5-format CASE.

    Mirrors reference ``hooks/functions.sql:38-58`` exactly: each WHEN
    tests its detection regex; non-matching input falls through to NULL;
    NULL-in -> NULL-out.
    """
    c = F.col(col) if isinstance(col, str) else col
    offset_tz = F.regexp_extract(c, r"((\+|-)\d\d:\d\d)$", 1)
    named_tz = parse_timezone_col(c)

    gc = lambda i: F.regexp_extract(c, _RX_COMPACT_FIELDS, i)  # noqa: E731
    compact = F.make_timestamp(
        gc(1).try_cast("int"),
        gc(2).try_cast("int"),
        gc(3).try_cast("int"),
        gc(4).try_cast("int"),
        gc(5).try_cast("int"),
        gc(6).try_cast("double"),
        F.concat(gc(7), F.lit(":"), gc(8)),
    )

    return (
        F.when(c.rlike(RX_FRAC_OFFSET), _oracle_fields_ts(c, offset_tz))
        .when(c.rlike(RX_OFFSET), _oracle_fields_ts(c, offset_tz))
        .when(c.rlike(RX_FRAC_ZONE), _oracle_fields_ts(c, named_tz))
        .when(c.rlike(RX_ZONE), _oracle_fields_ts(c, named_tz))
        .when(c.rlike(RX_COMPACT), compact)
    )


def parse_date_col(col: Column | str) -> Column:
    """``parse_date('01-FEB-19') -> DATE`` (reference functions.sql:60-63)."""
    c = F.col(col) if isinstance(col, str) else col
    rx = r"^(\d\d)-(\w\w\w)-(\d\d)$"
    g = lambda i: F.regexp_extract(c, rx, i)  # noqa: E731
    return F.when(
        c.rlike(rx),
        F.make_date(_yy_to_year(g(3)), _month_num(g(2)), g(1).try_cast("int")),
    )
