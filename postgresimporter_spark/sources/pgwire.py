"""Minimal pure-stdlib PostgreSQL frontend (wire protocol v3).

Why this exists: the reference's whole value proposition is COPY-speed
bulk load (pgfutter — a Go wrapper over Postgres ``COPY``, reference
``Dockerfile:1-10,26`` and ``main.py:491-542``). This container ships no
psycopg and no JDBC driver jar, but the PostgreSQL message protocol is
small, stable, and fully documented in the public manual ("Frontend/
Backend Protocol", protocol version 3.0) — implementing the handful of
messages needed for ``COPY ... FROM STDIN`` and simple queries takes a
few hundred lines of ``struct`` + ``socket`` and keeps executors
dependency-free: every Spark task can open its own connection from a
plain ``foreachPartition`` closure.

Supported surface (deliberately minimal):

- startup + auth: trust, cleartext password, md5 password (SCRAM is not
  implemented — spin the sink DB with ``--auth=trust`` or md5)
- simple query protocol (``Query``), including multi-statement scripts —
  the backend splits them itself, so dollar-quoted function bodies need
  no client-side parsing (exactly the property the reference leaned on
  by piping hook scripts through psql, reference exec.py:97-131)
- ``COPY ... FROM STDIN`` (CopyInResponse / CopyData / CopyDone)
- unix-domain sockets via the libpq convention: a ``host`` starting
  with ``/`` is a directory containing ``.s.PGSQL.<port>``

Not supported: extended query protocol, SSL, SCRAM, COPY TO, notify.
"""

from __future__ import annotations

import hashlib
import socket
import struct
from collections.abc import Iterable


class PgError(RuntimeError):
    """Server ErrorResponse, surfaced with severity/code/message."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '?????')}: "
            f"{fields.get('M', 'unknown error')}"
        )


def _parse_error_fields(payload: bytes) -> dict[str, str]:
    fields: dict[str, str] = {}
    for part in payload.split(b"\x00"):
        if part:
            fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
    return fields


class PgConnection:
    """One backend connection. Context-manageable; not thread-safe."""

    def __init__(
        self,
        host: str = "localhost",
        port: int | str = 5432,
        database: str = "postgres",
        user: str = "postgres",
        password: str | None = None,
        connect_timeout: float = 10.0,
    ):
        self.user = user
        port = int(port)
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(connect_timeout)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection(
                (host, port), timeout=connect_timeout
            )
        self._sock.settimeout(None)
        self._rf = self._sock.makefile("rb")
        self._startup(database, user, password)

    # -- low-level framing ---------------------------------------------------

    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(
            type_byte + struct.pack("!I", len(payload) + 4) + payload
        )

    def _recv(self) -> tuple[bytes, bytes]:
        head = self._rf.read(5)
        if len(head) < 5:
            raise PgError({"M": "server closed connection"})
        (length,) = struct.unpack("!I", head[1:5])
        payload = self._rf.read(length - 4) if length > 4 else b""
        return head[:1], payload

    # -- session -------------------------------------------------------------

    def _startup(
        self, database: str, user: str, password: str | None
    ) -> None:
        params = (
            f"user\x00{user}\x00database\x00{database}\x00\x00".encode()
        )
        body = struct.pack("!I", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack("!I", len(body) + 4) + body)
        while True:
            t, payload = self._recv()
            if t == b"R":
                (code,) = struct.unpack("!I", payload[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext
                    if password is None:
                        raise PgError({"M": "password required"})
                    self._send(b"p", password.encode() + b"\x00")
                elif code == 5:  # md5: md5(md5(password+user)+salt)
                    if password is None:
                        raise PgError({"M": "password required"})
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    outer = hashlib.md5(
                        inner.encode() + salt
                    ).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\x00")
                else:
                    raise PgError(
                        {"M": f"unsupported auth method {code} "
                              "(use trust/md5/password)"}
                    )
            elif t in (b"S", b"K", b"N"):  # params / key data / notice
                continue
            elif t == b"Z":  # ReadyForQuery
                return
            elif t == b"E":
                raise PgError(_parse_error_fields(payload))
            else:
                raise PgError({"M": f"unexpected startup message {t!r}"})

    def close(self) -> None:
        try:
            self._send(b"X", b"")
        except OSError:
            pass
        finally:
            try:
                self._rf.close()
            finally:
                self._sock.close()

    def __enter__(self) -> "PgConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- simple query --------------------------------------------------------

    def query(self, sql: str) -> list[tuple]:
        """Run a (possibly multi-statement) script via the simple query
        protocol; return the rows of the LAST result set, decoded as
        text (``None`` for SQL NULL). The backend handles statement
        splitting, so ``$tag$ ... $tag$`` bodies are safe verbatim."""
        self._send(b"Q", sql.encode() + b"\x00")
        rows: list[tuple] = []
        last_rows: list[tuple] = []
        error: PgError | None = None
        while True:
            t, payload = self._recv()
            if t == b"T":  # RowDescription: a fresh result set begins
                rows = []
            elif t == b"D":
                (n,) = struct.unpack("!H", payload[:2])
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", payload[off:off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[off:off + ln].decode())
                        off += ln
                rows.append(tuple(vals))
            elif t == b"C":  # CommandComplete — snapshot this set
                last_rows = rows
            elif t in (b"S", b"N", b"I"):
                continue
            elif t == b"E":
                error = PgError(_parse_error_fields(payload))
            elif t == b"Z":
                if error is not None:
                    raise error
                return last_rows
            elif t in (b"G", b"H"):
                raise PgError(
                    {"M": "COPY statement sent through query(); "
                          "use copy_in()"}
                )

    def scalar(self, sql: str):
        rows = self.query(sql)
        return rows[0][0] if rows else None

    # -- COPY FROM STDIN -----------------------------------------------------

    def copy_in(self, sql: str, chunks: Iterable[bytes]) -> int:
        """Run ``COPY ... FROM STDIN`` streaming ``chunks`` as CopyData;
        return the row count from the ``COPY n`` completion tag. The
        COPY is one implicit transaction: on any failure nothing is
        committed (which is what makes a Spark task retry safe)."""
        self._send(b"Q", sql.encode() + b"\x00")
        while True:
            t, payload = self._recv()
            if t == b"G":  # CopyInResponse
                break
            if t == b"E":
                err = PgError(_parse_error_fields(payload))
                self._drain_to_ready()
                raise err
            if t in (b"S", b"N"):
                continue
        try:
            for chunk in chunks:
                if chunk:
                    self._send(b"d", chunk)
        except Exception:
            self._send(b"f", b"aborted by client\x00")  # CopyFail
            self._drain_to_ready()
            raise
        self._send(b"c", b"")  # CopyDone
        n_rows = 0
        error: PgError | None = None
        while True:
            t, payload = self._recv()
            if t == b"C":
                tag = payload.rstrip(b"\x00").decode()
                if tag.startswith("COPY "):
                    n_rows = int(tag.split(" ")[1])
            elif t == b"E":
                error = PgError(_parse_error_fields(payload))
            elif t == b"Z":
                if error is not None:
                    raise error
                return n_rows
            elif t in (b"S", b"N"):
                continue

    def _drain_to_ready(self) -> None:
        while True:
            t, _ = self._recv()
            if t == b"Z":
                return


def connect(db, connect_timeout: float = 10.0) -> PgConnection:
    """Open a connection from a ``DbOptions``-shaped object (duck-typed:
    host/port/database/user/password attributes)."""
    return PgConnection(
        host=db.host or "localhost",
        port=db.port or 5432,
        database=db.database or "postgres",
        user=db.user or "postgres",
        password=db.password,
        connect_timeout=connect_timeout,
    )
