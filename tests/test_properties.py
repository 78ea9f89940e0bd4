"""Property-based tests (hypothesis) for the naming and function
libraries — the reference pins these with a handful of goldens; we
additionally pin them against independent Python models over generated
corpora (one Spark job per example batch)."""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from postgresimporter_spark.functions.text import STRIP_PATTERN, strip_col
from postgresimporter_spark.functions.timestamps import (
    parse_date_col,
    parse_timestamp_col,
)
from postgresimporter_spark.naming import table_name_for_path, to_filename

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

name_text = st.text(
    alphabet="abcXYZ012 .-_äöüß!#/", min_size=0, max_size=30
)
dirty_text = st.text(
    alphabet='abc XYZ\n\r"\'0,;ü', min_size=0, max_size=40
)


@SETTINGS
@given(st.lists(name_text, min_size=1, max_size=30))
def test_to_filename_idempotent_and_safe(titles):
    for t in titles:
        out = to_filename(t)
        assert re.fullmatch(r"[\w]*", out), out
        assert to_filename(out) == out  # idempotent


@SETTINGS
@given(st.lists(name_text, min_size=1, max_size=30))
def test_table_name_has_no_separator(titles):
    for t in titles:
        assert "_" not in table_name_for_path(f"{t}.csv")


def _python_strip(s):
    """Independent model of the reference strip() (functions.sql:1-5)."""
    if s is None:
        return None
    out = re.sub(STRIP_PATTERN, "", s)
    return out or None


@SETTINGS
@given(st.lists(dirty_text | st.none(), min_size=1, max_size=50))
def test_strip_matches_python_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    got = [r[0] for r in df.select(strip_col(F.col("raw"))).collect()]
    assert got == [_python_strip(v) for v in values]


@SETTINGS
@given(
    st.lists(
        st.dates(dt.date(1970, 1, 1), dt.date(2069, 12, 31)),
        min_size=1,
        max_size=50,
    )
)
def test_parse_date_roundtrip(spark, dates):
    raws = [d.strftime("%d-%b-%y").upper() for d in dates]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [r[0] for r in df.select(parse_date_col(F.col("raw"))).collect()]
    assert got == list(dates)


ts_strategy = st.datetimes(
    dt.datetime(1970, 1, 2), dt.datetime(2069, 12, 30)
).map(lambda d: d.replace(microsecond=0))
offset_strategy = st.integers(-14 * 60, 14 * 60)


@SETTINGS
@given(
    st.lists(
        st.tuples(ts_strategy, offset_strategy), min_size=1, max_size=40
    )
)
def test_parse_timestamp_offset_roundtrip(spark, pairs):
    """wall-clock + arbitrary offset -> parse -> UTC instant matches
    Python's own arithmetic."""
    raws, expected = [], []
    for wall, off_min in pairs:
        sign = "+" if off_min >= 0 else "-"
        hh, mm = divmod(abs(off_min), 60)
        raw = (
            wall.strftime("%d-%b-%y %I.%M.%S").upper()
            + wall.strftime(" %p")
            + f" {sign}{hh:02d}:{mm:02d}"
        )
        raws.append(raw)
        expected.append(wall - dt.timedelta(minutes=off_min))
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [
        r[0] for r in df.select(parse_timestamp_col(F.col("raw"))).collect()
    ]
    assert got == expected


@SETTINGS
@given(st.lists(ts_strategy, min_size=1, max_size=40))
def test_parse_timestamp_compact_roundtrip(spark, stamps):
    raws = [t.strftime("%Y%m%d%H%M%S") + "+0000" for t in stamps]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [
        r[0] for r in df.select(parse_timestamp_col(F.col("raw"))).collect()
    ]
    assert got == stamps
