"""Standalone CSV row counter (reference E3: ``python -m
postgresimporter.csvcount <source>`` prints ``{path: count}`` JSON,
csvcount.py:53-62).

Engine version counts *data rows* with a distributed CSV read (handles
quoted newlines; strictly better than the reference's ``wc -l`` fast
path which counted raw lines including the header — deviation documented
in FIXTURES.md §5).

Usage: ``python -m postgresimporter_spark.csvcount <dir-or-file>...``
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from .discovery import discover_csvs
from .session import get_spark


def count_sources(sources: list[str | Path]) -> dict[str, int]:
    spark = get_spark(app_name="csvcount")
    from .sources.csv import read_csv_all_text

    d = discover_csvs(sources)
    return {
        str(f): read_csv_all_text(spark, f).count() for f in d.dump_files
    }


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m postgresimporter_spark.csvcount <source>...")
        return 1
    print(json.dumps(count_sources(args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
