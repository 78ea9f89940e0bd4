"""JDBC sink configuration (no Postgres in this environment — the write
path is integration-gated; URL/property construction and env fallback are
the testable contract, reference cli.py:122-127 / main.py:122-142)."""

from __future__ import annotations

from postgresimporter_spark.sources.jdbc import DbOptions


def test_env_fallback(monkeypatch):
    monkeypatch.setenv("DB_NAME", "envdb")
    monkeypatch.setenv("DB_HOST", "envhost")
    monkeypatch.setenv("DB_PORT", "5433")
    monkeypatch.setenv("DB_USER", "envuser")
    monkeypatch.setenv("DB_PASSWORD", "envpass")
    db = DbOptions()
    assert db.url == "jdbc:postgresql://envhost:5433/envdb"
    assert db.properties["user"] == "envuser"
    assert db.properties["password"] == "envpass"


def test_cli_overrides_env(monkeypatch):
    monkeypatch.setenv("DB_NAME", "envdb")
    db = DbOptions(database="clidb", host="h", port="1", user="u")
    assert db.url == "jdbc:postgresql://h:1/clidb"


def test_copy_class_batching_defaults():
    db = DbOptions(database="d")
    assert db.properties["reWriteBatchedInserts"] == "true"
    assert int(db.properties["batchsize"]) >= 10000
    assert db.properties["driver"] == "org.postgresql.Driver"


def test_copy_sink_gated_without_psycopg(spark):
    import pytest

    from postgresimporter_spark.sources.copy_sink import (
        HAVE_PSYCOPG,
        copy_write,
        rows_to_copy_csv,
    )

    # CSV encoding works standalone (the unit-testable layer):
    # every non-NULL value quoted (so '' round-trips as an empty STRING
    # under COPY NULL ''), NULL as the unquoted empty field
    chunks = list(
        rows_to_copy_csv([(1, "a,b", None), (2, 'say "hi"', "")], 3)
    )
    text = b"".join(chunks).decode()
    assert text == '"1","a,b",\n"2","say ""hi""",""\n'

    if not HAVE_PSYCOPG:
        df = spark.createDataFrame([(1,)], ["a"])
        from postgresimporter_spark.sources.jdbc import DbOptions

        with pytest.raises(RuntimeError, match="psycopg is not installed"):
            copy_write(df, DbOptions(database="d"), "t")
