"""XML source goldens + incremental aggregate-maintenance contract."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from postgresimporter_spark.operators.incremental import (
    merge_partials,
    partial_aggregate,
)
from postgresimporter_spark.sources.xml import (
    read_xml,
    read_xml_all_text,
    write_xml,
)

XML_DOC = """<rows>
  <row><id>1</id><name>Grizzly</name><height>220</height></row>
  <row><id>2</id><name>Wallabie &amp; co</name><height>180</height></row>
  <row><id>3</id><name>Panda</name></row>
</rows>
"""


def test_xml_typed_read(spark, tmp_path):
    p = tmp_path / "animals.xml"
    p.write_text(XML_DOC)
    df = read_xml(spark, str(p))
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[2].name == "Wallabie & co"  # entity decoded
    assert rows[3].height is None  # missing element -> null


def test_xml_all_text_read(spark, tmp_path):
    p = tmp_path / "animals.xml"
    p.write_text(XML_DOC)
    df = read_xml_all_text(spark, str(p))
    assert set(dict(df.dtypes).values()) == {"string"}
    got = {r.id: r.height for r in df.collect()}
    assert got["1"] == "220" and got["3"] is None


def test_xml_write_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a<b"), (2, None)], "id long, s string"
    )
    out = tmp_path / "out_xml"
    write_xml(src, str(out))
    back = read_xml(spark, str(out))
    got = {r.id: r.s for r in back.collect()}
    assert got == {1: "a<b", 2: None}


SPECS = {
    "n": ("count", "v"),
    "total": ("sum", "v_dec"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _with_dec(df):
    return df.withColumn("v_dec", F.col("v").cast("decimal(18,2)"))


def test_incremental_merge_equals_full_recompute(spark):
    full = _with_dec(
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 10), ("a", 3), ("b", 20), ("c", 5)],
            "k string, v long",
        )
    )
    # split into 3 arbitrary increments
    incs = [
        full.where(F.col("v") <= 2),
        full.where((F.col("v") > 2) & (F.col("v") < 10)),
        full.where(F.col("v") >= 10),
    ]
    parts = [partial_aggregate(d, ["k"], SPECS) for d in incs]
    merged = {
        r.k: r for r in merge_partials(parts, ["k"], SPECS).collect()
    }
    direct = {
        r.k: r for r in partial_aggregate(full, ["k"], SPECS).collect()
    }
    assert set(merged) == set(direct) == {"a", "b", "c"}
    for k in direct:
        assert merged[k].n == direct[k].n
        assert merged[k].total == direct[k].total
        assert merged[k].lo == direct[k].lo
        assert merged[k].hi == direct[k].hi
    assert merged["a"].n == 3 and merged["a"].total == Decimal("6.00")


def test_incremental_chain_and_new_keys(spark):
    """State + delta with a brand-new key; count state merges as sum."""
    day1 = _with_dec(
        spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long")
    )
    day2 = _with_dec(
        spark.createDataFrame([("z", 7)], "k string, v long")
    )
    state = partial_aggregate(day1, ["k"], SPECS)
    new_state = merge_partials(
        [state, partial_aggregate(day2, ["k"], SPECS)], ["k"], SPECS
    )
    got = {r.k: r for r in new_state.collect()}
    assert got["a"].n == 2 and got["z"].n == 1
    assert got["z"].total == Decimal("7.00")


def test_incremental_rejects_non_decomposable(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    import pytest

    with pytest.raises(ValueError, match="non-decomposable"):
        partial_aggregate(df, ["k"], {"m": ("median", "v")})
