"""Structured Streaming surface.

The reference is a pure batch pipeline (SURVEY §2.7: no streaming
operators exist there); this package is north-star coverage — the same
event-time operators as ``operators/sessionize.py`` under incremental
execution with watermarks, plus a streaming variant of the CSV ingest
stage (new files appearing in a source directory load incrementally,
which is the streaming generalization of the reference's idempotent
re-run model)."""

from .pipeline import (
    stream_csv_ingest,
    stream_schema_for,
    stream_hourly_rollup,
    stream_sessionize,
)

__all__ = [
    "stream_csv_ingest",
    "stream_schema_for",
    "stream_hourly_rollup",
    "stream_sessionize",
]
