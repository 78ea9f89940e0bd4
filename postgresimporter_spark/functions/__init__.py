"""The packaged scalar-function library.

The reference unconditionally installs ``hooks/functions.sql`` into the
target database after import (``main.py:202-208``). This package provides
the same functions as Catalyst expression compositions — pure column
expressions that stay inside whole-stage codegen, with a ``register_all``
that exposes them to ``spark.sql`` text queries.
"""

from .text import strip_col, has_column
from .timestamps import (
    parse_date_col,
    parse_timestamp_col,
    parse_timezone_col,
    parse_timestamp_with_tz_col,
)
from .registry import register_all

__all__ = [
    "strip_col",
    "has_column",
    "parse_date_col",
    "parse_timestamp_col",
    "parse_timezone_col",
    "parse_timestamp_with_tz_col",
    "register_all",
]
