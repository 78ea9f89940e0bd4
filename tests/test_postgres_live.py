"""Live Postgres round-trip tests: the reference's E2E contract
(load CSVs -> Postgres -> count read-back -> reconciliation,
reference main.py:250-306) against a REAL server.

The container ships Postgres server binaries but no client library —
the sink speaks the wire protocol directly (sources/pgwire.py). The
fixture initdb's a throwaway cluster on a unix socket with trust auth;
Postgres refuses to run as root, so when the tests run as root the
server is spawned as ``nobody`` via su. Anything missing (binaries,
su, permissions) -> the whole module skips.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import subprocess
import time
from decimal import Decimal
from pathlib import Path

import pytest

from postgresimporter_spark.config import PipelineConfig
from postgresimporter_spark.pipeline import run_pipeline
from postgresimporter_spark.sources.copy_sink import (
    copy_write,
    execute_sql,
    table_counts,
)
from postgresimporter_spark.sources.jdbc import DbOptions
from postgresimporter_spark.sources.pgwire import PgConnection, PgError

PG_PORT = 55432
PG_USER = "tester"


def _run_as_pg_owner(cmd: str) -> subprocess.CompletedProcess:
    """Run a shell command as a user allowed to run Postgres."""
    import shlex

    if os.geteuid() == 0:
        cmd = f"su -s /bin/sh nobody -c {shlex.quote(cmd)}"
    return subprocess.run(
        cmd, shell=True, capture_output=True, text=True, timeout=60
    )


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    if not (shutil.which("initdb") and shutil.which("pg_ctl")):
        pytest.skip("postgres binaries not available")
    base = Path("/tmp") / f"pglive-{os.getpid()}"
    data, sock = base / "data", base / "sock"
    shutil.rmtree(base, ignore_errors=True)
    for d in (data, sock):
        d.mkdir(parents=True)
    if os.geteuid() == 0:
        subprocess.run(["chown", "-R", "nobody", str(base)], check=True)
    r = _run_as_pg_owner(
        f"initdb -D {data} -U {PG_USER} --auth=trust"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = _run_as_pg_owner(
        f"pg_ctl -D {data} -l {base}/log -o "
        f"\"-k {sock} -c listen_addresses='' -p {PG_PORT}\" start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl failed: {r.stderr[-200:]}")
    deadline = time.time() + 15
    while not (sock / f".s.PGSQL.{PG_PORT}").exists():
        if time.time() > deadline:
            _run_as_pg_owner(f"pg_ctl -D {data} stop -m immediate")
            pytest.skip("postgres socket never appeared")
        time.sleep(0.2)
    db = DbOptions(
        database="postgres", host=str(sock), port=str(PG_PORT),
        user=PG_USER,
    )
    yield db
    _run_as_pg_owner(f"pg_ctl -D {data} stop -m immediate")
    shutil.rmtree(base, ignore_errors=True)


def test_wire_client_basics(pg):
    with PgConnection(
        host=pg.host, port=pg.port, database=pg.database, user=pg.user
    ) as c:
        assert c.scalar("SELECT 41 + 1") == "42"
        assert c.query("SELECT NULL, ''") == [(None, "")]
        with pytest.raises(PgError) as ei:
            c.query("SELECT * FROM no_such_table_xyz")
        assert ei.value.fields.get("C") == "42P01"
        # connection survives an error and a multi-statement script
        assert c.query("SELECT 1; SELECT 'a;b' AS s") == [("a;b",)]


def test_copy_write_typed_roundtrip(spark, pg):
    df = spark.createDataFrame(
        [
            (
                1, "plain", 1.5, Decimal("12.34"),
                dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5),
                True, bytearray(b"\x00\xff"),
            ),
            (
                2, 'quote " comma , newline \n end', None, None,
                None, None, None, None,
            ),
            (3, "", 0.0, Decimal("0.00"), dt.date(1999, 12, 31),
             dt.datetime(1999, 12, 31, 23, 59, 59), False, bytearray(b"")),
        ],
        "id long, s string, d double, num decimal(10,2), dy date, "
        "ts timestamp, b boolean, bin binary",
    )
    copy_write(df, pg, "typed")
    with PgConnection(
        host=pg.host, port=pg.port, database=pg.database, user=pg.user
    ) as c:
        cols = c.query(
            "SELECT data_type FROM information_schema.columns "
            "WHERE table_schema='import' AND table_name='typed' "
            "ORDER BY ordinal_position"
        )
        assert [r[0] for r in cols] == [
            "bigint", "text", "double precision", "numeric", "date",
            "timestamp without time zone", "boolean", "bytea",
        ]
        rows = c.query(
            'SELECT id, s, d, num, dy, ts, b, bin FROM import."typed" '
            "ORDER BY id"
        )
    assert rows[0] == (
        "1", "plain", "1.5", "12.34", "2024-01-02",
        "2024-01-02 03:04:05", "t", "\\x00ff",
    )
    # NULLs stay NULL; empty string stays empty (not collapsed to NULL)
    assert rows[1][0] == "2" and rows[1][2:] == (None,) * 6
    assert "quote" in rows[1][1] and "\n" in rows[1][1]
    assert rows[2][1] == "" and rows[2][6] == "f"


def test_copy_write_append_and_overwrite(spark, pg):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    copy_write(df, pg, "ow")
    copy_write(df, pg, "ow", mode="append")
    assert table_counts(pg, ["ow"]) == {"ow": 2}
    copy_write(df, pg, "ow")  # overwrite resets
    assert table_counts(pg, ["ow"]) == {"ow": 1}
    assert table_counts(pg, ["never_made"]) == {"never_made": 0}


def test_execute_sql_dollar_quoted_function(pg):
    execute_sql(
        pg,
        "CREATE OR REPLACE FUNCTION import_live_fn() RETURNS int AS "
        "$body$ BEGIN RETURN 5; END; $body$ LANGUAGE plpgsql;",
    )
    with PgConnection(
        host=pg.host, port=pg.port, database=pg.database, user=pg.user
    ) as c:
        assert c.scalar("SELECT import_live_fn()") == "5"


def test_pipeline_live_roundtrip(spark, pg, tmp_path):
    """The reference's E2E: CSVs -> COPY into Postgres -> post-load hook
    runs IN the DB -> reconciliation compares CSV counts against the
    DB's own count(*) -> zero diff."""
    data = tmp_path / "data"
    data.mkdir()
    (data / "animals_1.csv").write_text(
        'name,origin,height\nGrizzly,"North America",220\n'
        'Wallabie,"Australia",180\n'
    )
    (data / "animals_2.csv").write_text(
        "name,origin,height\nPanda,China,150\n"
    )
    hook = tmp_path / "post.sql"
    hook.write_text(
        "CREATE TABLE import.hook_proof AS "
        'SELECT count(*) AS n FROM import."animals";\n'
        "SELECT broken syntax here;\n"  # must not stop the script
        "CREATE TABLE import.hook_proof2 AS SELECT 1 AS one;"
    )
    cfg = PipelineConfig(
        sources=[data], combine_tables=True, post_load=[hook], db=pg
    )
    result = run_pipeline(spark, cfg)
    assert result.check_passed
    report = {r.table: r for r in result.report.collect()}
    assert report["animals"].csv_rows == 3
    assert report["animals"].db_rows == 3
    assert report["animals"].difference == 0
    with PgConnection(
        host=pg.host, port=pg.port, database=pg.database, user=pg.user
    ) as c:
        rows = c.query(
            'SELECT name, origin, height FROM import."animals" '
            "ORDER BY name"
        )
        assert rows == [
            ("Grizzly", "North America", "220"),
            ("Panda", "China", "150"),
            ("Wallabie", "Australia", "180"),
        ]
        # all-text loading, pgfutter-style
        types = c.query(
            "SELECT DISTINCT data_type FROM information_schema.columns "
            "WHERE table_schema='import' AND table_name='animals'"
        )
        assert types == [("text",)]
        assert c.scalar("SELECT n FROM import.hook_proof") == "3"
        assert c.scalar("SELECT one FROM import.hook_proof2") == "1"


def test_stream_to_postgres_roundtrip(spark, pg, tmp_path):
    """Streaming COPY ingest: micro-batches land in Postgres via the
    COPY sink, and a restart from the checkpoint ingests only files
    that arrived after the first run (exactly-once source tracking)."""
    from postgresimporter_spark.streaming.pipeline import stream_to_postgres

    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    schema = "id long, s string"
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = stream_to_postgres(stream, pg, "streamed", ckpt)
    q.awaitTermination()

    with PgConnection(
        host=pg.host, port=pg.port, database=pg.database, user=pg.user
    ) as c:
        assert c.scalar('SELECT count(*) FROM import."streamed"') == "2"

    # new file arrives; restart from the same checkpoint -> appends
    # ONLY the new rows (old file already committed in the source log)
    spark.createDataFrame(
        [(3, "c")], "id long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    stream2 = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q2 = stream_to_postgres(stream2, pg, "streamed", ckpt)
    q2.awaitTermination()

    with PgConnection(
        host=pg.host, port=pg.port, database=pg.database, user=pg.user
    ) as c:
        rows = c.query('SELECT id FROM import."streamed" ORDER BY id')
    assert [r[0] for r in rows] == ["1", "2", "3"]
