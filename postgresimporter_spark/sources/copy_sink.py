"""COPY-protocol Postgres sink (the pgfutter-class fast path).

The reference's loader is pgfutter, a Go wrapper over Postgres ``COPY``
(Dockerfile:1-10,26) — substantially faster than JDBC INSERT batches.
This module provides the same class of throughput from Spark: each
partition opens one connection and streams its rows through
``COPY ... FROM STDIN`` via psycopg.

psycopg is not available in this build environment, so the module is
import-gated: constructing the writer without psycopg raises a clear
error, and everything above the connection boundary (CSV encoding of
partitions, connection fan-in capping) is unit-testable without a
server.
"""

from __future__ import annotations

import io
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame

from .jdbc import DbOptions

try:  # pragma: no cover - exercised only where psycopg exists
    import psycopg  # type: ignore

    HAVE_PSYCOPG = True
except ImportError:
    psycopg = None
    HAVE_PSYCOPG = False


def _encode_field(v) -> str:
    """COPY CSV field encoding with ``NULL ''``: NULL -> unquoted empty,
    everything else ALWAYS quoted — so an empty STRING round-trips as
    ``\"\"`` instead of being collapsed into NULL by the NULL rule
    (which applies to unquoted values only)."""
    if v is None:
        return ""
    return '"' + str(v).replace('"', '""') + '"'


def rows_to_copy_csv(rows: Iterable, n_cols: int) -> Iterator[bytes]:
    """Encode partition rows as COPY-friendly CSV chunks (~1 MiB)."""
    buf = io.StringIO()
    for row in rows:
        buf.write(
            ",".join(_encode_field(row[i]) for i in range(n_cols)) + "\n"
        )
        if buf.tell() > 1 << 20:
            yield buf.getvalue().encode()
            buf.seek(0)
            buf.truncate()
    if buf.tell():
        yield buf.getvalue().encode()


def copy_write(
    df: DataFrame,
    db: DbOptions,
    table: str,
    num_partitions: int | None = None,
) -> None:
    """Stream a DataFrame into ``import.<table>`` via COPY, one
    connection per partition (``num_partitions`` caps connection
    fan-in — 1000 executors must not open 1000x cores connections).
    """
    if not HAVE_PSYCOPG:
        raise RuntimeError(
            "psycopg is not installed: COPY sink unavailable; use "
            "sources.jdbc.write_table (batched JDBC) instead"
        )
    n_cols = len(df.columns)
    conninfo = (
        f"host={db.host} port={db.port} dbname={db.database} "
        f"user={db.user} password={db.password}"
    )
    target = f'import."{table}"'

    def _write_partition(rows):  # pragma: no cover - needs a server
        with psycopg.connect(conninfo) as conn:
            with conn.cursor() as cur:
                with cur.copy(
                    f"COPY {target} FROM STDIN (FORMAT csv, NULL '')"
                ) as cp:
                    for chunk in rows_to_copy_csv(rows, n_cols):
                        cp.write(chunk)
            conn.commit()

    out = df.repartition(num_partitions) if num_partitions else df
    out.foreachPartition(_write_partition)


__all__ = ["copy_write", "rows_to_copy_csv", "HAVE_PSYCOPG"]
