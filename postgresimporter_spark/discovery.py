"""Source discovery: recursive zip/CSV scanning, exclude-regex, grouping.

Re-implements the reference's discovery semantics
(``main.py:144-194``):

- zips: recursive ``rglob('*.zip')`` (lowercase only), dedup via set,
  extraction target = sibling dir named after the stem, skip if the
  target dir already exists unless ``process_all``.
- csvs: recursive ``rglob('*.csv')``, dedup, exclude files whose *stem*
  matches the exclude regex with ``re.match`` (anchored at start —
  reference ``main.py:180-185``), then group by derived prefix table name.

Discovery is metadata-scale driver work (path lists, not rows), exactly as
in the reference; the data itself is only touched by distributed reads.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

from .naming import table_name_for_path


@dataclass(frozen=True)
class ZipJob:
    src: Path
    dest: Path


@dataclass
class DiscoveredSources:
    dump_files: list[Path] = field(default_factory=list)
    table_csv_files: dict[str, list[Path]] = field(default_factory=dict)


def _as_paths(sources: list[str | Path]) -> list[Path]:
    return [Path(s) for s in sources]


def discover_zips(
    sources: list[str | Path], process_all: bool = False
) -> list[ZipJob]:
    """Find zip archives and pair each with its extraction directory.

    Reference: ``main.py:144-169``. A literal ``.zip`` path is accepted
    as-is; directories are scanned recursively; already-extracted archives
    (target dir exists) are skipped unless ``process_all``.
    """
    found: set[Path] = set()
    for src in _as_paths(sources):
        if src.is_file() and src.suffix == ".zip":
            found.add(src)
        elif src.is_dir():
            found.update(src.rglob("*.zip"))
    jobs = []
    for zf in found:
        dest = zf.parent / zf.stem
        if dest.exists() and not process_all:
            continue
        jobs.append(ZipJob(src=zf, dest=dest))
    return sorted(jobs, key=lambda j: (str(j.src), str(j.dest)))


def discover_csvs(
    sources: list[str | Path], exclude_regex: str | None = None
) -> DiscoveredSources:
    """Find CSV files, apply the exclude regex, group by prefix table name.

    Reference: ``main.py:171-194``. The regex matches against the file
    *stem* and is anchored at the start (``re.match``).
    """
    found: set[Path] = set()
    for src in _as_paths(sources):
        # case-sensitive suffix match: the reference accepts only
        # lowercase extensions in both literal-file branches
        # (main.py:146, main.py:173)
        if src.is_file() and src.suffix == ".csv":
            found.add(src)
        elif src.is_dir():
            found.update(src.rglob("*.csv"))

    dump_files = sorted(found)
    if exclude_regex is not None:
        pattern = re.compile(exclude_regex)
        dump_files = [f for f in dump_files if not pattern.match(f.stem)]

    groups: dict[str, list[Path]] = {}
    for f in dump_files:
        groups.setdefault(table_name_for_path(f), []).append(f)
    for files in groups.values():
        files.sort()
    return DiscoveredSources(dump_files=dump_files, table_csv_files=groups)


__all__ = ["ZipJob", "DiscoveredSources", "discover_zips", "discover_csvs"]
