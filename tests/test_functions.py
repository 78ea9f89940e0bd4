"""Function-library corpus from the reference (hooks/functions.sql,
FIXTURES.md §3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgresimporter_spark.functions import (
    parse_date_col,
    parse_timestamp_col,
    parse_timezone_col,
    register_all,
    strip_col,
)


def run_scalar(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["raw"])
    return [r[0] for r in df.select(col_fn(F.col("raw"))).collect()]


def test_strip(spark):
    got = run_scalar(
        spark,
        strip_col,
        ['\n\rhello"world"\r\n', '""', "keep me", "", "a\nb", None],
    )
    assert got == ["helloworld", None, "keep me", None, "a\nb", None]


def test_parse_timestamp_offset_formats(spark):
    got = run_scalar(
        spark,
        parse_timestamp_col,
        [
            "31-JAN-19 03.20.00.000000000 PM +01:00",
            "31-JAN-19 03.20.00 PM +01:00",
            "31-JAN-19 03.20.00.123456789 PM +01:00",
        ],
    )
    # session tz is UTC: 15:20 +01:00 == 14:20 UTC
    assert got[0] == dt.datetime(2019, 1, 31, 14, 20, 0)
    assert got[1] == dt.datetime(2019, 1, 31, 14, 20, 0)
    # 9-digit fraction truncates to Spark's microsecond precision
    assert got[2] == dt.datetime(2019, 1, 31, 14, 20, 0, 123456)


def test_parse_timestamp_named_zone(spark):
    got = run_scalar(
        spark,
        parse_timestamp_col,
        [
            "28-MAR-19 05.02.10.000000000 AM GMT",
            "28-MAR-19 05.02.10 AM GMT",
        ],
    )
    assert got == [dt.datetime(2019, 3, 28, 5, 2, 10)] * 2


def test_parse_timestamp_compact(spark):
    got = run_scalar(
        spark, parse_timestamp_col, ["20190101013449+0000", "20190101013449+0130"]
    )
    assert got[0] == dt.datetime(2019, 1, 1, 1, 34, 49)
    assert got[1] == dt.datetime(2019, 1, 1, 0, 4, 49)


def test_parse_timestamp_am_pm_edges(spark):
    got = run_scalar(
        spark,
        parse_timestamp_col,
        [
            "01-JUN-19 12.00.00 AM +00:00",  # midnight
            "01-JUN-19 12.00.00 PM +00:00",  # noon
        ],
    )
    assert got == [
        dt.datetime(2019, 6, 1, 0, 0, 0),
        dt.datetime(2019, 6, 1, 12, 0, 0),
    ]


def test_parse_timestamp_null_on_garbage(spark):
    got = run_scalar(
        spark, parse_timestamp_col, ["not a timestamp", "", None, "2019-01-01"]
    )
    assert got == [None, None, None, None]


def test_parse_timezone(spark):
    got = run_scalar(
        spark,
        parse_timezone_col,
        ["28-MAR-19 05.02.10.000000000 AM GMT", "31-JAN-19 03.20.00 PM +01:00"],
    )
    assert got == ["GMT", None]


def test_parse_date(spark):
    got = run_scalar(
        spark, parse_date_col, ["01-FEB-19", "31-JAN-19", "junk", None]
    )
    assert got == [dt.date(2019, 2, 1), dt.date(2019, 1, 31), None, None]


def test_sql_registration(spark):
    register_all(spark)
    row = spark.sql(
        "SELECT strip('\\n\"x\"') AS s, parse_date('01-FEB-19') AS d, "
        "parse_timezone('28-MAR-19 05.02.10 AM GMT') AS z"
    ).collect()[0]
    assert row.s == "x"
    assert row.d == dt.date(2019, 2, 1)
    assert row.z == "GMT"


def test_sql_parse_timestamp_matches_column_api(spark):
    register_all(spark)
    corpus = [
        "31-JAN-19 03.20.00.000000000 PM +01:00",
        "31-JAN-19 03.20.00 PM +01:00",
        "28-MAR-19 05.02.10.000000000 AM GMT",
        "28-MAR-19 05.02.10 AM GMT",
        "20190101013449+0000",
        "garbage",
        None,
    ]
    df = spark.createDataFrame([(v,) for v in corpus], ["raw"])
    df.createOrReplaceTempView("ts_corpus")
    via_sql = [
        r[0]
        for r in spark.sql(
            "SELECT parse_timestamp(raw) FROM ts_corpus"
        ).collect()
    ]
    via_col = run_scalar(spark, parse_timestamp_col, corpus)
    assert via_sql == via_col


def test_collect_json(spark):
    from postgresimporter_spark.functions.text import collect_json
    import json

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    got = json.loads(collect_json(df.orderBy("id")))
    assert got == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    empty = spark.createDataFrame([], "id int")
    assert json.loads(collect_json(empty)) == []
